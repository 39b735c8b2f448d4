package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Physical-plan regression guards: the scale properties that make these
  * queries viable at 100 TB are asserted, not assumed — if an edit turns a
  * broadcast join into a sort-merge (or worse, a cartesian product), or
  * un-pushes a scan filter, this spec fails before any bench does.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: filters pushed to the parquet scan; schema pruned to needed columns") {
    val p = plan(RelationalQueries.q01ScanFilterProject(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("LessThan(l_shipdate"),
      "shipdate filter must reach the scan")
    assert(p.contains("LessThan(l_quantity,10.0)"), "quantity filter must reach the scan")
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_returnflag"),
      s"scan reads more columns than the query needs: $readSchema")
  }

  test("q08 star join: all dimensions broadcast, no sort-merge, no cartesian") {
    val p = plan(RelationalQueries.q08JoinStar(spark, sf))
    assert(p.split("BroadcastHashJoin").length >= 4, "3 dims must broadcast")
    assert(!p.contains("SortMergeJoin"), "no fact-side shuffle join expected")
    assert(!p.contains("CartesianProduct"))
  }

  test("q42 prefix-filtered Jaccard: equi-joins only — never a cartesian/BNL pair stage") {
    val p = plan(DedupQueries.q42NgramJaccard(spark, sf))
    assert(!p.contains("CartesianProduct"), "pair generation degenerated to N²")
    assert(!p.contains("BroadcastNestedLoopJoin"), "pair generation degenerated to N²")
  }

  test("q44 near-dup: tiled equi self-join — no full-corpus BNL/cartesian, tile keys joined") {
    val p = plan(DedupQueries.q44EmbedNearDup(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), "all-pairs over the full corpus")
    assert(!p.contains("CartesianProduct"))
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_ti") && keyLines.contains("_tj"),
      s"join keys must be the tile pair, got:\n$keyLines")
    // normalization stays per-row (Project), never inside the O(N²) condition
    val joinSection = p.linesIterator.filter(_.contains("Join condition")).mkString
    assert(!joinSection.contains("unit_vec"),
      "normalization leaked into the join condition: evaluated N² times instead of N")
  }

  test("q56 banded near-dup: band equi-join only — no BNL/cartesian, band keys joined") {
    val p = plan(DedupQueries.q56EmbedNearDupCand(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate generation degenerated to N²")
    assert(!p.contains("CartesianProduct"))
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_bk") && keyLines.contains("_bv"),
      s"candidate join keys must be the (band index, band value) pair, got:\n$keyLines")
  }

  test("q57/q59/q64 row-local operators: pure projections, zero Exchange") {
    // quantization, chunking, and redaction are per-row transforms — a
    // shuffle appearing in any of them means the operator stopped scaling
    // embarrassingly
    for ((name, df) <- Seq(
        "q57" -> AnnQueries.q57EmbedQuantize(spark, sf),
        "q59" -> TextQueries.q59ChunkTokens(spark, sf),
        "q64" -> TextQueries.q64PiiRedact(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name must not shuffle:\n${p.take(800)}")
    }
  }

  test("q36 interval join: time bucket rides the equi-join key — no bare-key self-join") {
    val p = plan(RelationalQueries.q36IntervalJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_gbkt_l") && keyLines.contains("_gbkt_r"),
      s"join keys must include the time bucket, got:\n$keyLines")
  }

  test("q10 latest-by-key: aggregation with partial (map-side) phase, no window sort") {
    val p = plan(RelationalQueries.q10LatestByKey(spark, sf))
    assert(!p.contains("Window"), "latest-by-key must not window-sort the log")
    assert(p.contains("max_by"))
    assert(p.split("Aggregate").length >= 3, "expected partial + final aggregate phases")
  }

  test("q09 stream-table enrich: dimension broadcast, fact side un-shuffled before agg") {
    val p = plan(RelationalQueries.q09JoinEnrich(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q72 BM25: one corpus scan (persisted prune), partial top-k, the only BNLJ is the 1-row stats frame") {
    // simple mode: each node appears once (formatted mode re-lists nodes
    // in its detail section, so occurrence counts there mislead)
    val p = TextQueries.q72Bm25(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be a partial sort-limit, never a global sort")
    assert(p.split("BroadcastNestedLoopJoin").length == 2,
      "exactly one BNLJ expected: the broadcast 1-row corpus-stats frame")
    // all three consumers (stats/tf/df) must read the persisted pruned
    // projection, not re-scan the corpus: three InMemoryTableScans (each
    // prints its cached InMemoryRelation subtree — those inner scans are
    // the one cached scan, not repeats)
    assert(p.split("InMemoryTableScan").length >= 4,
      "stats/tf/df must all read the persisted pruned projection")
  }

  test("q73/q74 span aggregation: two-phase keyed counts, never an Expand distinct") {
    val p73 = plan(TextQueries.q73RepeatedSpans(spark, sf))
    assert(!p73.contains("Expand"),
      "countDistinct-style Expand doubles the exploded span stream")
    val p74 = plan(TextQueries.q74BoilerplateCoverage(spark, sf))
    assert(!p74.contains("Expand"))
    assert(p74.contains("InMemoryTableScan"), "span table must be persisted once")
    assert(!p74.contains("CartesianProduct"))
  }

  test("q79 fuzzy join: composite-block equi-join; length bound structurally inside the join; thresholded kernel") {
    val p = plan(RelationalQueries.q79FuzzyJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), "fuzzy join degenerated to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "fuzzy join degenerated to all-pairs")
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("c_nationkey") && keyLines.contains("_blk"),
      s"composite block keys must be the equi-join keys, got:\n$keyLines")
    // the Levenshtein lower bound must be part of the JOIN itself (a
    // structural guarantee), not a post-join filter the optimizer may or
    // may not evaluate before the O(len²) kernel
    val cond = p.linesIterator.filter(_.contains("Join condition")).mkString
    assert(cond.contains("length"),
      s"length-difference prune must ride the join condition, got: $cond")
    // bounded kernel: the 3-arg thresholded levenshtein (DP early-exit)
    assert(p.contains("levenshtein") && p.contains("_name"),
      "thresholded levenshtein kernel expected in the plan")
  }

  test("q84 quota sample: bounded top-k aggregation — no per-stratum window sort") {
    val p = plan(TextQueries.q84QuotaSampleAgg(spark, sf))
    assert(!p.contains("Window"),
      "window sort defeats the bounded-state path — that's q80's shape")
    assert(p.contains("ObjectHashAggregate"),
      "typed top-k aggregator should plan as an object hash aggregate")
    assert(p.contains("partial_"),
      "map-side partial combine required — per-stratum shuffle bytes must be #tasks x k")
  }

  test("q85 BM25 batch arm: terms join broadcasts; only BNLJ is the 1-row stats frame") {
    // simple mode: each node appears once (the q72 pin's convention)
    val p = TextQueries.q85Bm25Batch(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct"))
    assert(p.split("BroadcastNestedLoopJoin").length == 2,
      "exactly one BNLJ expected: the broadcast 1-row corpus-stats frame")
    assert(p.contains("BroadcastHashJoin"), "terms/df joins must broadcast")
    assert(!p.contains("SortMergeJoin"), "nothing in this plan should shuffle-join")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be a partial sort-limit, never a global sort")
  }

  test("q83 unicode normalize: pure projection, zero Exchange before the sink") {
    val p = plan(TextQueries.q83NormalizeUnicode(spark, sf))
    assert(!p.contains("Exchange"), "per-row normalization must not shuffle")
    assert(p.contains("unicode_normalize"), "NFC expression expected in the projection")
  }

  test("q86 url blocklist: pure projection, zero Exchange, hosts extracted once") {
    val p = plan(TextQueries.q86UrlBlocklist(spark, sf))
    assert(!p.contains("Exchange"), "per-row filtering must not shuffle")
    assert(p.split("regexp_extract_all").length == 2,
      "hosts must be extracted exactly once into an attribute (lambda-capture pitfall)")
  }

  test("q88 paragraph dedup: keyed aggs over one persisted explode — no pairs, no Expand") {
    val p = plan(TextQueries.q88ParagraphDedup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "paragraph dedup must never be document-pair-shaped")
    assert(!p.contains("Expand"), "no countDistinct-style stream doubling")
    assert(p.contains("InMemoryTableScan"),
      "the exploded paragraph table must be persisted once for its two consumers")
    assert(!p.contains("Window"), "first-owner selection is an agg, not a window sort")
  }

  test("q61 codec kernel: parallelism follows cores, not the input file's splits") {
    val df = MultimodalQueries.q61MultimodalDecode(spark, sf)
    val parts = df.rdd.getNumPartitions
    assert(parts >= spark.sparkContext.defaultParallelism / 2,
      s"codec stage would run on $parts partition(s) — repartition lost")
  }

  test("q96 strip spans: token-grain anti join over one persisted gram table — no pairs, no Window") {
    val p = plan(TextQueries.q96StripSpans(spark, sf))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "boilerplate removal must never be document-pair-shaped")
    assert(p.contains("InMemoryTableScan"),
      "the positioned n-gram explode must be persisted — two consumers")
    assert(!p.contains("Window"), "reassembly is a sorted-struct agg, not a window sort")
    assert(p.contains("LeftAnti"), "survivors come from a token-grain anti join")
  }

  test("q97 hybrid search: no cartesian; only BNLJs are the 1-row stats and query frames") {
    val p = AnnQueries.q97HybridSearch(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct"))
    assert(p.split("BroadcastNestedLoopJoin").length <= 4,
      "BNLJs must be 1-row frames only: BM25 stats + the broadcast dense query")
  }

  test("q94 BPE encode: dictionary equi-join, never corpus-shaped; train is loop-external") {
    val merges = graft.operators.Bpe.bpeTrain(
      graft.Tables.documents(spark, sf).limit(50), "text", numMerges = 3)
    val p = plan(graft.operators.Bpe.bpeEncode(
      graft.Tables.documents(spark, sf), "doc_id", "text", merges))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "doc tokens must EQUI-join the encoded dictionary")
    assert(!p.contains("Window"))
  }

  test("q92 LM score: one cached event explode, no Window, stats frame is the only BNLJ") {
    val p = TextQueries.q92LmScore(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
    assert(p.contains("InMemoryTableScan"),
      "the (pos,cur,prev) event table must be persisted — four consumers")
    assert(p.split("BroadcastNestedLoopJoin").length <= 3,
      "only the two 1-row (N,V) stats-frame crosses may be BNLJs")
    assert(!p.contains("SortMergeJoin"),
      "model joins must hash-join (broadcast at gate scale)")
  }

  test("q93 source overlap: self-join keyed on the shingle hash — no cartesian, no window") {
    val p = plan(DedupQueries.q93SourceOverlap(spark, sf))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the pair stage must stay an equi-join on the shingle hash")
    assert(!p.contains("Window"))
    assert(p.contains("InMemoryTableScan"),
      "the distinct (source, shingle) table must be persisted — three consumers")
  }

  test("q95 diversity sample: literal-centroid assignment + bounded agg — no explode, no window") {
    // simple mode: each node appears once (the q85 pin's convention)
    val p = AnnQueries.q95DiversitySample(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Window"),
      "the quota draw must be the bounded-state aggregation, not a window sort")
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_"),
      "per-cluster top-k state must reduce map-side")
    assert(p.split("Generate").length == 2,
      "exactly one Generate expected — the k-sized top-k unpack AFTER the agg; " +
        "assignment itself must be an argmax projection, never a corpus x centroid explode")
    assert(!p.contains("Exchange") || p.split("Exchange").length <= 3,
      "one stratum shuffle expected")
  }

  test("q104 embed decontaminate: band-keyed equi join, reference broadcast — no cartesian") {
    val p = DedupQueries.q104EmbedDecontaminate(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cross-corpus candidates degenerated to all-pairs")
    assert(p.contains("BroadcastHashJoin"),
      "the model-sized reference (band rows + vectors) must broadcast")
    assert(p.contains("_bk"), "candidates must join on the band keys")
  }

  test("q101 DSIR: LLR table broadcasts to the scoring join; gram table persisted once") {
    val p = TextQueries.q101DsirSelect(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the bucket-keyed scoring join must broadcast the model-sized LLR table")
    assert(!p.contains("SortMergeJoin"),
      "nothing in DSIR may shuffle-sort — the corpus is never joined to itself")
    assert(p.contains("InMemoryTableScan"),
      "the raw gram projection must be persisted — it feeds the raw counts AND the scoring")
    assert(p.contains("TakeOrdered"),
      "top-k selection must be a partial TakeOrdered, not a global sort")
    // the only nested-loop joins are the two 1-row stats frames
    assert(p.split("BroadcastNestedLoopJoin").length <= 3,
      "BNLJs beyond the 1-row totals frames")
  }

  test("q102 tf-idf keywords: one persisted tf table feeds df and scoring; window only per-doc") {
    val p = TextQueries.q102TfidfKeywords(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"),
      "the (doc, term) tf table must be persisted — one tokenize pass, two consumers")
    // the 1-row N frame is the only nested-loop join
    assert(p.split("BroadcastNestedLoopJoin").length <= 2,
      "BNLJs beyond the 1-row corpus-size frame")
    assert(p.contains("Window"), "per-doc top-k rides the doc-partitioned window")
  }

  test("q103 stratified split: allocation broadcasts; one stratum window over the rows") {
    val p = TextQueries.q103StratifiedSplit(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the config-sized [lo, hi) allocation table must broadcast to the rows")
    assert(!p.contains("SortMergeJoin"),
      "row-side data must never shuffle for the allocation join")
    assert(p.split("Window").length <= 5,
      "windows beyond the row-side rank + the three apportionment passes " +
        "over the config-sized allocation frame")
  }

  test("q112 drift: token rows aggregated once; the dense grid is built from aggregate frames") {
    val df = TextQueries.q112SourceDrift(spark, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"))
    assert(p.contains("InMemoryTableScan"),
      "the (group, bucket) count table must be persisted — one token scan, three consumers")
    // the only nested-loop joins are the broadcast cross joins of
    // aggregate-sized frames (groups × buckets grid + the 1-row stats)
    assert(p.split("BroadcastNestedLoopJoin").length <= 4,
      "nested-loop joins beyond the grid build + stats frames")
  }

  test("q113 NB classify: model frames broadcast; per-doc argmax is an agg, not a window") {
    val p = TextQueries.q113NbClassify(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Window"),
      "the per-doc argmax must be the bounded K-element min-struct aggregation")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the K-row class frame must broadcast to the scoring events")
    assert(!p.contains("SortMergeJoin") ||
      p.split("SortMergeJoin").length <= 2,
      "only the vocab-scale (label, token) count join may shuffle")
  }

  test("q116 frozen-NB stream shape: ONE aggregation; argmax is a projection, not a second agg") {
    val cuts = Seq("train" -> 80, "rest" -> 100)
    val docs = graft.Tables.documents(spark, sf)
    val model = graft.operators.TextOps.nbTrain(
      graft.operators.Relational.hashSplit(docs, "text", cuts)
        .filter(col("split") === "train"), "text", "lang")
    val held = graft.operators.Relational.hashSplit(docs, "text", cuts)
      .filter(col("split") =!= "train")
    val out = graft.operators.TextOps.nbScoreWith(held, "doc_id", "text", model)
    val p116 = out.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the physical text truncates wide Project field lists, so the
    // sort_array argmax is pinned on the optimized LOGICAL plan
    val opt = out.queryExecution.optimizedPlan.toString
    graft.CacheScope.release()
    // everything ABOVE the scoring aggregation (the plan text before the
    // first HashAggregate, root-first) must be pure projection: the
    // argmax is a sort_array over K literal structs, never a second
    // stateful aggregate or a window — the property that lets the same
    // code run under Structured Streaming
    val aboveAgg = p116.split("HashAggregate")(0)
    assert(!aboveAgg.contains("Exchange") && !aboveAgg.contains("Window"),
      "nothing stateful may sit above the scoring aggregation")
    assert(opt.contains("sort_array") && !p116.contains("Window"),
      "the argmax must be the sort_array projection, never a window")
  }

  test("q118 curation v4: the composed pipeline inherits every component's shape — no cartesian, no BNLJ beyond the broadcast model frames") {
    val df = TextQueries.q118CurationV4(spark, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct"))
    // the classifier's K-class expansion frames are the only
    // nested-loop joins; the winnow pair join and the anti join are keyed
    assert(p.split("BroadcastNestedLoopJoin").length <= 2,
      "nested-loop joins beyond the class-expansion cross join")
    assert(p.contains("LeftAnti"), "the dedup drop must be an anti join, not a filter-in")
  }

  test("q117 winnowing: doc-bounded window over generated grams; pair join keyed on the fingerprint") {
    val df = TextQueries.q117WinnowPairs(spark, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    graft.CacheScope.release()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the overlap sweep must join on the fingerprint key, never all pairs")
    assert(p.contains("InMemoryTableScan"),
      "the winnowed posting table must be persisted — one build, two join sides")
    // the tokenizer must NOT be inlined into the gram lambda (the
    // lambda-capture pitfall): the generator input references the
    // projected token attribute, not split(text)
    val gen = p.linesIterator.filter(_.contains("Generate")).mkString("\n")
    assert(!gen.contains("split("),
      s"tokenizer leaked into the generator — re-tokenizes per gram:\n$gen")
  }

  test("q108 kNN graph: tiled equi self-join + bounded-state agg — no cartesian, no window sort") {
    val p = plan(AnnQueries.q108KnnGraph(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation degenerated to N²")
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_ti") && keyLines.contains("_tj"),
      s"join keys must be the tile pair, got:\n$keyLines")
    assert(!p.contains("Window"),
      "per-query top-k must be the bounded-state TopKAgg aggregation, not a " +
        "row_number window pulling every scored pair of a query into one partition")
  }

  test("q109 hard negatives: query frame is the broadcast side; band filter precedes ranking") {
    val df = AnnQueries.q109HardNegatives(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), "the corpus must never shuffle for the query join")
    // the non-equi (query != neighbor) join is a BNLJ by construction; its
    // build side must be the broadcast query frame, never the corpus
    val simple = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(simple.split("BroadcastNestedLoopJoin").length <= 2,
      "exactly one nested-loop join (broadcast queries x corpus scan) expected")
    // the band predicate must sit under the window rank, not above it —
    // rows outside the band never reach the top-k shuffle
    val opt = df.queryExecution.optimizedPlan.toString
    val filterIdx = opt.linesIterator.zipWithIndex
      .collectFirst { case (l, i) if l.contains(">= 0.1") => i }.getOrElse(-1)
    val windowIdx = opt.linesIterator.zipWithIndex
      .collectFirst { case (l, i) if l.contains("row_number") => i }.getOrElse(-1)
    assert(filterIdx > windowIdx && windowIdx >= 0,
      s"band filter (line $filterIdx) must be BELOW the ranking window (line $windowIdx)")
  }

  test("q110 shard manifest: one keyed aggregation over a pure projection — one Exchange, no window") {
    val p = TextQueries.q110ShardManifest(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") && !p.contains("Join"))
    assert(p.split("Exchange").length <= 2,
      "shard manifest is one map-side-combined keyed agg: exactly one shuffle")
    assert(p.split("HashAggregate").length >= 3, "expected partial + final aggregate phases")
  }

  test("q121/q122 extraction + segmentation: per-row project/generate, zero Exchange") {
    for ((name, df) <- Seq(
        "q121" -> TextQueries.q121HtmlExtract(spark, sf),
        "q122" -> TextQueries.q122SentenceSplit(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name must not shuffle:\n${p.take(800)}")
    }
  }

  test("q123 epoch shuffle: exactly ONE Exchange — the (epoch, shard) window partition") {
    val p = plan(TextQueries.q123EpochShuffle(spark, sf))
    // formatted explain names each node twice (tree + detail): count details
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q124 sentence chunks: one doc-keyed Exchange reused by the chunk agg — no join") {
    val p = plan(TextQueries.q124SentenceChunks(spark, sf))
    // the window partitions by doc_id and the (doc, chunk) aggregation's
    // clustering is satisfied by that same partitioning: ONE Exchange
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(!p.contains("Join"), "no join belongs in a per-doc chunker")
  }

  test("q126 sentence dedup: persisted sentence table, digest-keyed first-owner agg, never doc-pair-shaped") {
    val p = plan(TextQueries.q126SentenceDedup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "sentence dedup degenerated to a doc-pair shape")
    assert(!p.contains("Window"), "first-owner must be an aggregation, not a window sort")
    assert(p.contains("InMemoryTableScan"),
      "the exploded sentence table must be persisted for its consumers")
  }

  test("q128 window analytics: both windows ride ONE customer-keyed Exchange") {
    val p = plan(RelationalQueries.q128WindowAnalytics(spark, sf))
    // two Window nodes (chrono family + spend ntile) but the partitioning
    // key is shared, so the plan pays a single shuffle and two sorts
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(p.split("\\(\\d+\\) Window").length - 1 == 2,
      s"expected exactly two Window nodes:\n${p.take(1200)}")
    assert(!p.contains("Join"))
  }

  test("q129 snapshot diff: one keyed join, fingerprints projected before the shuffle") {
    val p = plan(RelationalQueries.q129SnapshotDiff(spark, sf))
    assert(p.contains("FullOuter"), "diff must be a single full-outer keyed join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "no window sort belongs in a diff")
  }

  test("q131 FIM transform: pure codegen projection — zero Exchange, zero Join") {
    val p = plan(TextQueries.q131Fim(spark, sf))
    assert(!p.contains("Exchange"), s"FIM must not shuffle:\n${p.take(800)}")
    assert(!p.contains("Join"))
    assert(p.contains("[codegen id :"), "md5/substring cuts must stay in codegen")
  }

  test("q135 curation v6: composition stays equi-keyed — no cartesian, argmax is an agg") {
    val p = plan(DedupQueries.q135CurationV6(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a composition stage degenerated to a pair shape")
    assert(!p.contains("Window"),
      "keep-most-central must be the max_by aggregation, not a window sort")
  }

  test("q137 span corruption: ONE doc-keyed Exchange shared by both windows and the reassembly agg") {
    val p = plan(TextQueries.q137SpanCorrupt(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange — the run-detection windows and the reassembly " +
        s"aggregation must share the doc partitioning:\n${p.take(1200)}")
    assert(p.split("\\(\\d+\\) Window").length - 1 == 2,
      "expected the lag window + the running span count, nothing more")
    assert(!p.contains("Join"), "no join belongs in a per-doc transform")
  }

  test("q138 rebalanced mixture: derived weights BROADCAST back — corpus side never sort-merges") {
    val p = plan(TextQueries.q138RebalancedMixture(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "the stratum->weight frame must broadcast onto the corpus scan")
    assert(!p.contains("SortMergeJoin"),
      "corpus shuffled to meet an aggregate-sized weight table")
    // the lone BNLJ is the pinned 1-row total-tokens frame (the BM25 convention)
    assert(p.split("\\(\\d+\\) BroadcastNestedLoopJoin").length - 1 <= 1 &&
      !p.contains("CartesianProduct"),
      s"unexpected pair-shaped join:\n${p.take(1200)}")
    assert(!p.contains("Window"), "the draw is a projection, not a window sort")
  }

  test("q139 dedup-aware split: keyed join against the cluster map — no pair shape, no window") {
    val p = plan(DedupQueries.q139DedupAwareSplit(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "split assignment degenerated to a pair shape")
    assert(!p.contains("Window"), "split labels are hash projections, not ranks")
    assert(p.contains("LeftOuter"),
      "cluster map must attach as a left join (singletons keep their own id)")
  }

  test("q140 CDC apply: changelog collapses by AGGREGATION, snapshot pays one anti join — no window") {
    val p = plan(RelationalQueries.q140ApplyChanges(spark, sf))
    assert(!p.contains("Window"),
      "net change must be the max_by aggregation, not a row_number window")
    assert(p.contains("LeftAnti"), "snapshot must anti-join the net key set")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q142 sessionize: ONE key Exchange shared by the gap flag and the running session count") {
    val p = plan(RelationalQueries.q142Sessionize(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(!p.contains("Join"), "no join belongs in sessionization")
  }

  test("q143 funnel: keyed joins/aggs only — no window over the event log, no pair shape") {
    val p = plan(RelationalQueries.q143Funnel(spark, sf))
    assert(!p.contains("Window"), "funnel stages are aggregations, not windows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q144 retention: two keyed aggs + one key join — no window anywhere") {
    val p = plan(RelationalQueries.q144Retention(spark, sf))
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q145 gap fill: spine is a per-key generator; carries share one window sort") {
    val p = plan(RelationalQueries.q145GapFill(spark, sf))
    assert(p.contains("Generate"), "the grid spine must be a sequence generator")
    // Spark may split the four carry expressions across up to 3 Window
    // nodes, but they must all ride ONE key-partitioned sort
    assert(p.split("\\(\\d+\\) Window").length - 1 <= 3 &&
      p.split("\\(\\d+\\) Sort").length - 1 == 1,
      s"carry windows must share a single sort:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "spine attached as a pair shape instead of the (key, slot) equi-join")
  }

  test("q146 triangles: wedge/closing joins stay equi-keyed — no pair shape, no window") {
    val p = plan(GraphQueries.q146Triangles(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "triangle listing degenerated to an all-pairs shape")
    assert(!p.contains("Window"), "counts are aggregations, not window sorts")
    assert(p.contains("LeftSemi"), "the closing edge must check as a semi join")
    graft.CacheScope.release()
  }

  test("q147 rolling agg: ONE key Exchange, a single RANGE-frame Window, no join") {
    val p = plan(RelationalQueries.q147RollingAgg(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1)
    assert(!p.contains("Join"))
  }

  test("q169 cusum: ONE key Exchange shared by both running windows (prefix-sum + prefix-min), no join") {
    val p = plan(RelationalQueries.q169Cusum(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"the two nested running aggregates must share one key shuffle:\n${p.take(1200)}")
    assert(!p.contains("Join"), "CUSUM is windows-only — no join anywhere")
  }

  test("q167 association rules: group/item equi-joins only — no cartesian, no BNLJ") {
    val p = plan(RelationalQueries.q167AssociationRules(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rule mining must stay equi-keyed:\n${p.take(1200)}")
  }

  test("q168 asof tolerance: the bound is a projection — same single-shuffle shape as q23") {
    val p23 = plan(RelationalQueries.q23AsofJoin(spark, sf))
    val p = plan(RelationalQueries.q168AsofTolerance(spark, sf))
    def ex(s: String) = s.split("\\(\\d+\\) Exchange").length - 1
    assert(ex(p) == ex(p23),
      s"tolerance must not add a shuffle: q168=${ex(p)} vs q23=${ex(p23)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q148 length batches: bucket projection + ONE bucket-keyed window — no join") {
    val p = plan(TextQueries.q148LengthBatches(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(!p.contains("Join"))
  }

  test("q149 analytics mart: the events composition stays key-joined — no pair shape") {
    val p = plan(RelationalQueries.q149AnalyticsMart(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a mart stage degenerated to a pair shape")
    // the three per-user frames join on the user key only
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("user_id"), s"joins must be user-keyed:\n$keyLines")
  }

  test("q150 range join: EQUI join on the value bucket — never a nested-loop inequality join") {
    val p = plan(RelationalQueries.q150RangeJoin(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the range join fell back to the nested-loop inequality plan")
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_rbkt"), s"join keys must include the bucket:\n$keyLines")
  }

  test("q151 SCD-2: ONE key Exchange + one lead window — no joins") {
    val p = plan(RelationalQueries.q151Scd2(spark, sf))
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1)
    assert(!p.contains("Join"), "a version chain needs no join")
  }

  test("q152 calibration: stats broadcast into a projection — no global-sort ntile") {
    val p = plan(TextQueries.q152Calibration(spark, sf))
    assert(!p.contains("ntile"), "equal-width bins must not use a global-sort quantile")
    assert(!p.contains("CartesianProduct"))
    graft.CacheScope.release()
  }

  test("q153 key skew: hot arm is a partial top-k, never a global sort of the key table") {
    val p = plan(RelationalQueries.q153KeySkew(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k must compile to a partial TakeOrdered, not Sort+Limit over one partition")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    graft.CacheScope.release()
  }

  test("q154 anomalies: the rollingAgg shape — one Exchange, one Window, no join") {
    val p = plan(RelationalQueries.q154Anomalies(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n${p.take(1200)}")
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1,
      "all three running sums must ride ONE Window node")
    assert(!p.contains("Join"))
  }

  test("q155 expectations: all rule counters in ONE aggregation pass — adding rules never adds scans") {
    val p = plan(RelationalQueries.q155Expectations(spark, sf))
    // two scans total: the rule aggregate + the distinct-key aggregate
    assert(p.split("\\(\\d+\\) Scan parquet").length - 1 <= 2,
      s"rule counters must share one scan:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
  }

  test("q158 co-occurrence: group-keyed self-join over the distinct projection — no pair shape") {
    val p = plan(RelationalQueries.q158CoOccurrence(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair enumeration must be a group-keyed equi self-join")
    assert(p.contains("InMemoryTableScan"),
      "the distinct (group, item) table must be persisted for both join sides")
    graft.CacheScope.release()
  }

  test("q159 transitions: one key-partitioned lag window + one keyed agg, no join") {
    val p = plan(RelationalQueries.q159Transitions(spark, sf))
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1)
    assert(!p.contains("Join"))
  }

  test("q160 forward as-of: union + ONE key shuffle + running window — no range join") {
    val p = plan(RelationalQueries.q160AsofForward(spark, sf))
    assert(p.contains("Union"), "forward as-of must be the union+window shape")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "forward as-of degenerated to a range-join explosion")
  }

  test("q161 concurrency: runs as jobs (distributed prefix sum), result rides a checkpoint") {
    val df = RelationalQueries.q161Concurrency(spark, sf)
    val p = plan(df)
    // the global cumsum must NOT be a single all-rows window in the final
    // plan: the operator materializes via range partitions + offsets, so
    // the result is checkpoint-backed (ExistingRDD), not a Window chain
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected a checkpoint-backed result:\n${p.take(800)}")
    graft.CacheScope.release()
  }

  test("q163 period-over-period: period-grain self-join — no window, no row-grain pair shape") {
    val p = plan(RelationalQueries.q163PeriodOverPeriod(spark, sf))
    assert(!p.contains("Window"), "the adjacent period attaches by equi join, not lag")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    graft.CacheScope.release()
  }

  test("q164 pareto: checkpoint-backed result (distributed prefix sum ran as jobs)") {
    val p = plan(RelationalQueries.q164Pareto(spark, sf))
    assert(p.contains("ExistingRDD"),
      s"expected a checkpoint-backed result:\n${p.take(800)}")
    graft.CacheScope.release()
  }

  test("q172/q173 gopher + c4: stateless scan-speed projections — zero Exchange, no join, no window") {
    for ((name, df) <- Seq(
        "q172" -> WebQueries.q172GopherRules(spark, sf),
        "q173" -> WebQueries.q173C4Clean(spark, sf))) {
      val p = plan(df)
      assert(p.split("\\(\\d+\\) Exchange").length - 1 == 0,
        s"$name must be a pure per-row projection:\n${p.take(1200)}")
      assert(!p.contains("Join") && !p.contains("Window"), name)
    }
  }

  test("q174 perplexity buckets: cutoffs broadcast back; the only windows order the score HISTOGRAM") {
    val p = plan(WebQueries.q174PerplexityBuckets(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the languages-sized cutoff frame must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
    // two window nodes (running cum + per-lang total), both over the
    // per-(lang, score) histogram aggregate — never the doc-grain frame
    assert(p.split("\\(\\d+\\) Window").length - 1 == 2,
      s"expected the two histogram windows only:\n${p.take(1500)}")
    graft.CacheScope.release()
  }

  test("q175 chat render: the lag window and the keyed agg share ONE conversation Exchange") {
    val p = plan(WebQueries.q175ChatRender(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"window + agg must share the conversation partitioning:\n${p.take(1200)}")
    assert(!p.contains("Join"))
  }

  test("q178 preference pairs: ONE keyed max_by/min_by agg — never a per-prompt rank window") {
    val p = plan(WebQueries.q178PreferencePairs(spark, sf))
    assert(!p.contains("Window"),
      s"extremes must aggregate, not rank:\n${p.take(1200)}")
    assert(!p.contains("Join"))
  }

  test("q179 loss mask: ONE conversation Exchange + one running-sum window, no join") {
    val p = plan(WebQueries.q179LossMask(spark, sf))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"expected one conversation shuffle:\n${p.take(1200)}")
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1)
    assert(!p.contains("Join"))
  }

  test("q181 bleu: gram-keyed equi joins only (the rouge machinery) — no cartesian/BNLJ") {
    val p = plan(DedupQueries.q181Bleu(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair scoring degenerated to a pair-cross shape")
    graft.CacheScope.release()
  }

  test("q182 chrf / q183 token-f1: gram-keyed equi joins only — no cartesian/BNLJ") {
    for (df <- Seq(DedupQueries.q182Chrf(spark, sf), DedupQueries.q183TokenF1(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "pair scoring degenerated to a pair-cross shape")
      graft.CacheScope.release()
    }
  }

  test("q184/q187 bradley-terry: final plan reads the checkpointed ratings — no cartesian") {
    // the per-round shape is pinned in RankSpec (zero-Exchange broadcast
    // rounds); here: the returned plan joins the cached items frame with
    // the final checkpoint leaf and nothing quadratic survives
    for (df <- Seq(RankQueries.q184BradleyTerry(spark, sf),
        RankQueries.q187PreferenceLeaderboard(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), "pair-cross shape in the ratings plan")
      assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
        "ratings must ride the final round's checkpoint")
      graft.CacheScope.release()
    }
  }

  test("q189 unimax draw: the q99 window shape with collected budgets — no join at corpus grain") {
    val p = plan(RankQueries.q189UnimaxDraw(spark, sf))
    // budgets arrive as a LITERAL map (languages-sized collect), so the
    // draw is exactly the q99 plan: one per-language window, no join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "budget lookup must be the literal map, not a join")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the corpus-grain draw must not join at all")
    graft.CacheScope.release()
  }

  test("q191 spearman: prefix-sum ranks ride checkpoints — no global-order Window") {
    val p = plan(RankQueries.q191LeaderboardAgreement(spark, sf))
    // both rank sides are the distributed two-phase prefix sum, so the
    // final plan reads checkpoint leaves; a Window here would mean a
    // corpus serialized through one task's row_number
    assert(p.contains("ExistingRDD"), "ranks must ride the prefix-sum checkpoints")
    assert(!p.contains("Window"), "global-order window crept into the rank path")
    assert(!p.contains("CartesianProduct"))
    graft.CacheScope.release()
  }

  test("q190 pass@k: one keyed aggregation, zero joins, zero windows") {
    val p = plan(RankQueries.q190PassAtK(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"),
      "pass@k must be one agg + projection")
    graft.CacheScope.release()
  }

  test("q185 unimax: corpus aggregates once; windows ride the model-sized sources frame") {
    val p = plan(RankQueries.q185Unimax(spark, sf))
    // one corpus-grain scan inside the operator (the budget scalar is a
    // separate driver-side 1-row action in the gate); the only join is
    // the 1-row cutoff broadcast
    assert(!p.contains("CartesianProduct"), "unexpected pair shape")
    // the sources frame is cached, so the corpus-grain scan+aggregate
    // executes once however many consumers read it (the plan text still
    // PRINTS the cache's build scan under every InMemoryTableScan ref)
    assert(p.contains("InMemoryTableScan"),
      "cutoff and projection must both read the CACHED sources frame")
    graft.CacheScope.release()
  }

  test("q192 roc-auc: one global agg over the prefix-sum checkpoint — no Window, no join") {
    val p = plan(MetricsQueries.q192RocAuc(spark, sf))
    // midranks ride the distributed prefix sum: the final plan is a
    // 1-row aggregation over the checkpoint leaf; a Window here would
    // mean the corpus serialized through one task's cumulative count
    assert(p.contains("ExistingRDD"), "midranks must ride the prefix-sum checkpoint")
    assert(!p.contains("Window"), "global-order window crept into the rank path")
    assert(!p.contains("Join"), "roc-auc needs no join at all")
    graft.CacheScope.release()
  }

  test("q193 retrieval metrics: both windows AND the final agg share ONE query-key Exchange") {
    val p = plan(MetricsQueries.q193RetrievalMetrics(spark, sf))
    assert(p.split("\\(\\d+\\) Window").length - 1 == 2,
      "rank + ideal-rank: exactly two windows")
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 1,
      s"the query-key partitioning must be reused end to end:\n${p.take(800)}")
    assert(!p.contains("Join"), "per-query metrics never join")
  }

  test("q194 ks drift: value-grain equi join of the two ECDF checkpoints — no pair shape") {
    val p = plan(MetricsQueries.q194KsDrift(spark, sf))
    assert(p.contains("ExistingRDD"), "ECDFs must ride the prefix-sum checkpoints")
    assert(!p.contains("CartesianProduct"))
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_v"), s"the ECDF join must be value-keyed:\n$keyLines")
    // the only nested-loop shape is the broadcast 1-row totals cross
    // (the BT normalization convention) — text-count is unreliable here
    // (cached build plans reprint under every InMemoryTableScan ref), so
    // pin the KIND: every occurrence must be the broadcast cross
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "a non-broadcast nested loop crept into the ECDF path")
    graft.CacheScope.release()
  }

  test("q195 cohen kappa: marginals and finale ride the CACHED confusion matrix") {
    val p = plan(MetricsQueries.q195CohenKappa(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "totals, marginals and pe must all read the cached |labels|² frame")
    assert(!p.contains("CartesianProduct"))
    graft.CacheScope.release()
  }

  test("q197 search eval: inherits q72's top-k + the retrieval-metrics window shape") {
    val p = plan(MetricsQueries.q197SearchEval(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), "q72's partial top-k must survive")
    assert(!p.contains("CartesianProduct"))
    assert(p.split("\\(\\d+\\) Window").length - 1 == 2,
      "rank + ideal-rank over the 10-row result list")
    graft.CacheScope.release()
  }

  test("q127 curation v5: the extraction-era composition inherits every component's shape") {
    val p = plan(TextQueries.q127CurationV5(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a composition stage degenerated to a pair shape")
    assert(p.contains("InMemoryTableScan"),
      "the dedup stage's persisted sentence table must survive the composition")
    // exactly two Windows end to end: the chunker's per-doc running sum and
    // the epoch addresser's per-(epoch, shard) rank — dedup contributes none
    assert(p.split("\\(\\d+\\) Window").length - 1 == 2,
      s"expected exactly two Windows:\n${p.take(1500)}")
  }

  test("q198 l-diversity: grain agg + ONE class-keyed window — no join, no global order") {
    val p = plan(PrivacyQueries.q198LDiversity(spark, sf))
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1,
      "exactly one window: the per-class descending-count rank")
    assert(!p.contains("Join"), "the audit never joins")
    // grain Exchange + class Exchange; the finale reuses the window's
    // class partitioning — a third Exchange means that reuse broke
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 2,
      s"expected exactly two Exchanges:\n${p.take(1200)}")
    graft.CacheScope.release()
  }

  test("q199 t-closeness: cached grain feeds all consumers; only broadcast crosses; one class window") {
    val p = plan(PrivacyQueries.q199TCloseness(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "global, classes and the matrix join must all read the cached grain")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the only nested loops allowed are the model-sized broadcast crosses")
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1,
      "exactly one window: the per-class ordered-EMD prefix")
    graft.CacheScope.release()
  }

  test("q202 concentration: prefix-sum ranks (checkpoint leaf), TakeOrdered top-10, no global window") {
    val p = plan(MetricsQueries.q202Concentration(spark, sf))
    assert(p.contains("ExistingRDD"),
      "Lorenz ranks must ride the prefix-sum checkpoint")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-10 share must be a partial top-k, not a global sort")
    assert(!p.contains("Window"), "a global-order window crept into the rank path")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the only nested loops allowed are the 1-row broadcast crosses")
    graft.CacheScope.release()
  }

  test("q203 jsd drift: one value-grain collapse + 1-row totals broadcast — no window, no shuffle join") {
    val p = plan(MetricsQueries.q203JsdDrift(spark, sf))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the totals must ride a broadcast cross")
    graft.CacheScope.release()
  }

  test("q204 preference cycles: pair-grain collapse, equi wedge joins only — no pair shape") {
    val p = plan(RankQueries.q204PreferenceCycles(spark, sf))
    assert(!p.contains("CartesianProduct"), "wedge enumeration degenerated to N^2")
    assert(!p.contains("BroadcastNestedLoopJoin"), "wedge enumeration degenerated to N^2")
    assert(!p.contains("Window"), "no window belongs in the triangle path")
    assert(p.contains("InMemoryTableScan"),
      "wedges and the closing-edge lookup must reuse the cached oriented frame")
    graft.CacheScope.release()
  }

  test("q205 psi drift: the q203 shape — one value-grain collapse, broadcast totals") {
    val p = plan(MetricsQueries.q205PsiDrift(spark, sf))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the totals must ride a broadcast cross")
    graft.CacheScope.release()
  }

  test("q207 temperature mix: one corpus collapse; windows ride the model-sized sources frame") {
    val p = plan(RankQueries.q207TemperatureMix(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // the remainder rank is the ONE window, over the cached sources frame
    assert(p.split("\\(\\d+\\) Window").length - 1 == 1,
      "exactly one window: the Hamilton remainder rank")
    assert(p.contains("InMemoryTableScan"),
      "quota and top-up must reuse the cached per-source frame")
    graft.CacheScope.release()
  }

  test("q208 average precision: descending prefix-sum checkpoints, score-keyed joins only") {
    val p = plan(MetricsQueries.q208AveragePrecision(spark, sf))
    assert(p.contains("ExistingRDD"),
      "the PR curve must ride the prefix-sum checkpoints")
    assert(!p.contains("Window"), "a global-order window crept into the rank path")
    assert(!p.contains("CartesianProduct"))
    val keyLines = p.linesIterator.filter(_.contains("keys [")).mkString("\n")
    assert(keyLines.contains("_s"), s"the curve joins must be score-keyed:\n$keyLines")
    graft.CacheScope.release()
  }

  test("q209 prob scorecard: one bin-grain collapse — no join, no window") {
    val p = plan(MetricsQueries.q209ProbScorecard(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 == 2,
      "bin-grain partial+final agg then the 1-row finale — two Exchanges")
    graft.CacheScope.release()
  }

  test("q210 fairness report: cached confusion grain, pooled rates broadcast, no window") {
    val p = plan(MetricsQueries.q210FairnessReport(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "per-group and pooled rates must both read the cached (g, y, p) grain")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the pooled rates must ride a 1-row broadcast cross")
    graft.CacheScope.release()
  }

  test("q211 mcnemar: one corpus-collapsing aggregation — nothing else") {
    val p = plan(MetricsQueries.q211Mcnemar(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"))
    assert(p.split("\\(\\d+\\) Exchange").length - 1 <= 1,
      "one partial+final global agg at most")
    graft.CacheScope.release()
  }

  test("q212 class report: inherits q113's model-join shape; report rides the cached grain") {
    val p = plan(MetricsQueries.q212ClassReport(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "marginals, diagonal and finale must read the cached confusion grain")
    assert(!p.contains("CartesianProduct"))
    graft.CacheScope.release()
  }

  test("q196 mcc: rides the cached confusion grain; diagonal meets marginals in a broadcast cross") {
    val p = plan(MetricsQueries.q196Mcc(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "marginals and diagonal must read the cached confusion grain")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the two 1-row finales may only meet in a broadcast cross")
    graft.CacheScope.release()
  }

  test("q220 macro report: inherits the report's cached confusion grain; one global agg tail") {
    val p = plan(MetricsQueries.q220MacroReport(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "the summary must ride the report's cached confusion grain")
    assert(!p.contains("CartesianProduct"))
    graft.CacheScope.release()
  }

  test("q217 fleiss kappa: rides the cached cell grain; finales meet in a broadcast cross") {
    val p = plan(MetricsQueries.q217FleissKappa(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "per-item sums and category marginals must read the cached cell grain")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the two 1-row finales may only meet in a broadcast cross")
    graft.CacheScope.release()
  }

  test("q213 funnel A/B: inherits the funnel's step joins + the chi-square grain tail") {
    val p = plan(MetricsQueries.q213FunnelAb(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"),
      "the chi-square tail must ride its cached contingency grain")
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "only the model-sized broadcast crosses may nest loops")
    graft.CacheScope.release()
  }

  test("q216 gains table: prefix-sum checkpoint ranks; windows only on the band grain") {
    val p = plan(MetricsQueries.q216GainsTable(spark, sf))
    assert(p.contains("ExistingRDD"),
      "the rank path must ride the prefix-sum checkpoint")
    assert(!p.contains("CartesianProduct"))
    // the two running sums ride the <=10-row band frame — allowed; what
    // must NOT appear is a window before the band aggregation collapses
    // the corpus (the band agg sits between the score join and the window)
    assert(p.split("\\(\\d+\\) Window").length - 1 <= 2,
      "only the band-grain running sums may window")
    graft.CacheScope.release()
  }

  test("q200 chi-square: cached contingency grain, broadcast-built grid, no window") {
    val p = plan(MetricsQueries.q200ChiSquare(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "marginals, totals and the grid join must all read the cached grain")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && !l.trim.startsWith("("))
      .forall(_.contains("Cross BuildRight")),
      "the only nested loops allowed are the model-sized broadcast crosses")
    assert(!p.contains("Window"), "chi-square needs no window at all")
    graft.CacheScope.release()
  }

  test("q225 exact-substring: corpus-sized exchanges carry the 8-byte gram hash, raw grams only candidate-sized") {
    // The r14 hash-band contract (r13 verdict item 1): the corpus-wide
    // banding stages (gram-hash repeat count + candidate semi-join) must
    // ship xxhash64(gram) — ~20 bytes/row — never the minLen raw chars
    // (~minLen× corpus bytes: a 4 PB shuffle at 100 TB / minLen=40); raw
    // grams cross exchanges only in the candidate-sized verify stage, and
    // the document text crosses at most the ONE verify re-join.
    // disable auto-broadcast so the spec sees the SCALE shape (at the
    // spec's SF every join would broadcast and no exchange would exist
    // to inspect; at 100 TB none of these sides is broadcastable)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (df, p) =
      try { val d = DedupQueries.q225ExactSubstring(spark, sf); (d, plan(d)) }
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert(!p.contains("CartesianProduct"), "gram repeat test degenerated to pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "gram repeat test degenerated to pairs")
    assert(p.contains("LeftSemi"), "the coverage mark must be a semi-join (no repeat multiplicity)")
    assert(p.contains("xxhash64"), "the banding hash is gone — raw grams are shuffling corpus-wide")
    assert(p.contains("Generate"), "stride-1 grams ride one generator, not a join")
    // What each shuffle CARRIES = the `Input` line of every `(N) Exchange`
    // block in the formatted plan. The plan duplicates the verify subtree
    // (the repeat-count agg and the coverage semi-join each re-derive
    // candGrams; exchange REUSE only lands at runtime), so normalize away
    // expression ids and dedupe before counting.
    val lines = p.linesIterator.toVector
    val shuffles = lines.zipWithIndex.collect {
      case (l, i) if l.trim.matches("""\(\d+\) Exchange""") =>
        lines.drop(i + 1).find(_.trim.startsWith("Input"))
          .getOrElse("").replaceAll("#\\d+L?", "")
    }.distinct
    def carries(in: String, name: String) = in.contains(name + ",") || in.contains(name + "]")
    assert(shuffles.nonEmpty, s"no exchanges to inspect:\n$p")
    val banding = shuffles.filter(carries(_, "_h"))
    assert(banding.nonEmpty, s"no hash-carrying banding exchange found in: $shuffles")
    assert(banding.forall(in => !carries(in, "_g") && !carries(in, "_t")),
      s"a banding exchange carries raw gram chars or document text: $shuffles")
    assert(shuffles.count(carries(_, "_t")) <= 1,
      s"document text may cross at most the one verify re-join exchange: $shuffles")
    assert(shuffles.exists(in => !carries(in, "_g") && !carries(in, "_t")),
      s"at least the hash-count exchange must be fully narrow: $shuffles")
  }
}
