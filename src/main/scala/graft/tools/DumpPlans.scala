package graft.tools
import java.nio.file.{Files, Paths}
import graft.queries._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "graft-plans", master = "local[4]",
      extraConf = Map("spark.sql.shuffle.partitions" -> "4"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val entries: Seq[(String, String, DataFrame)] = Seq(
      ("q01_scan_filter_project",
       "Filters reach the parquet scan (PushedFilters), ReadSchema pruned to 5 of 11 columns, single WholeStageCodegen span.",
       RelationalQueries.q01ScanFilterProject(spark, d)),
      ("q08_join_star",
       "TPC-H Q5 shape: every dimension BroadcastHashJoin (no fact shuffle until the final keyed agg), partial+final HashAggregate.",
       RelationalQueries.q08JoinStar(spark, d)),
      ("q10_latest_by_key",
       "Compacted-topic view: partial+final max_by aggregation — one key shuffle, NO window sort of the log.",
       RelationalQueries.q10LatestByKey(spark, d)),
      ("q23_asof_join",
       "As-of join as union + single key shuffle + running last() window: O(|L|+|R|), no range-join explosion.",
       RelationalQueries.q23AsofJoin(spark, d)),
      ("q36_interval_join",
       "Interval join BUCKETIZED: join keys = (user_id, floor(ts/10min)) with ±1-bucket left expansion; exact time bound filters candidates. Candidates track bucket occupancy — never per-key pair squares.",
       RelationalQueries.q36IntervalJoin(spark, d)),
      ("q41_dedup_minhash",
       "shingle->minhash->band explode->equi-join on (band,minhash)->pair dedup->exact verify on re-attached sorted hash arrays.",
       DedupQueries.q41DedupMinhash(spark, d)),
      ("q42_ngram_jaccard",
       "All-Pairs prefix filter: df aggregation, rarest-first prefix (row_number window), prefix-only equi-join + length filter, exact verify. No cartesian anywhere.",
       DedupQueries.q42NgramJaccard(spark, d)),
      ("q44_embed_neardup",
       "Exact near-dup as a TILED self-join: hashed id-blocks, tile pair (i<=j) as the equi key, unit_vec projected per-row BEFORE the join, codegen dot as the filter. No full-corpus broadcast, no BNLJ.",
       DedupQueries.q44EmbedNearDup(spark, d)),
      ("q50_ann_brute",
       "Queries broadcast (ANN contract: queries << corpus); corpus scanned once with no shuffle; per-query top-k via bounded window.",
       AnnQueries.q50AnnBrute(spark, d)),
      ("q53_ann_ivf",
       "IVF probe: corpus assigned to buckets by one NearestCentroids argmax pass (no window, no corpus×nlist explode); probes broadcast; per-query top-k window only on candidates.",
       AnnQueries.q53AnnIvf(spark, d)),
      ("q56_embed_neardup_cand",
       "Banded candidates: per-row sketches (band family DERIVED from threshold/recall/corpus size), ids-only band explode, (band,value) equi self-join, pair dedup, verify = two id joins re-attaching the SHARED persisted unit-vector projection + codegen dot filter. No BNLJ/cartesian; vectors never ride the band explode.",
       DedupQueries.q56EmbedNearDupCand(spark, d)),
      ("q67_ann_ivfpq",
       "IVF-PQ two-stage probe: corpus assigned to k-means coarse lists + residual-encoded by argmax passes (models ride as literals — no join against a model table); probes broadcast; compressed scan of probed lists only; exact rerank joins full vectors for the shortlist alone.",
       AnnQueries.q67AnnIvfPq(spark, d)),
      ("q68_embed_neardup_auto",
       "Auto-dispatched near-dup: at gate corpus size the calibrated cost model picks the exact tiled arm — the plan IS q44's tiled self-join (one sizing aggregate precedes it); at scale past the crossover the same call compiles to q56's banded plan.",
       DedupQueries.q68EmbedNearDupAuto(spark, d)),
      ("q69_decontaminate",
       "Decontamination: corpus shingle posting BroadcastHashJoins against the exploded eval posting (eval is model-sized) — corpus scanned once, never shuffled; only shingle hits reach the partial+final (doc,eval) count aggregation.",
       DedupQueries.q69Decontaminate(spark, d)),
      ("q57_embed_quantize",
       "Int8 quantization: pure per-row projection — scan + one Project, ZERO Exchange (asserted in PlanSpec). The shape every row-local curation op in this engine compiles to.",
       AnnQueries.q57EmbedQuantize(spark, d)),
      ("q59_chunk_tokens",
       "Token chunking: tokenize, windowed slice via sequence+transform, posexplode — per-row generate, no shuffle.",
       TextQueries.q59ChunkTokens(spark, d)),
      ("q61_multimodal_decode",
       "Real-codec path: one id-only Exchange spreads the synth input to cores (codec parallelism must follow CPUs, not the small file's split count — r6 fix, 4.1->1.2 s), then DeserializeToObject -> partition-parallel MapPartitions (imageio encode/decode/resize kernel) -> SerializeFromObject. The kernel boundary is the only non-codegen span, by design.",
       MultimodalQueries.q61MultimodalDecode(spark, d)),
      ("q72_bm25_search",
       "BM25: tokens filtered to query terms BEFORE the explode (map-side prune — the generate's input array is already query-only), and that pruned projection persisted once (InMemoryRelation) for its three consumers (stats/tf/df) — ONE corpus scan. Per-term df joins as BroadcastHashJoin, corpus stats as a 1-row BroadcastNestedLoopJoin (single-row frame, the one legitimate BNLJ), final TakeOrderedAndProject — a partial top-k, never a global sort.",
       TextQueries.q72Bm25(spark, d)),
      ("q74_boilerplate_coverage",
       "Boilerplate coverage: one exploded span table persisted (InMemoryRelation) feeding the common-span aggregation, the per-doc totals, and a LEFT SEMI join. No broadcast hint anywhere: at gate scale the optimizer broadcasts the small common-span side; at corpus scale (common spans ~ vocabulary) the same plan degrades to a shuffle semi join by size estimate, not by code change.",
       TextQueries.q74BoilerplateCoverage(spark, d)),
      ("q75_inverted_index",
       "Inverted index: (term, doc) partial counts combine map-side, then the postings cap is applied BEFORE the collect — a per-term row_number Window whose term partitioning the final HashAggregate reuses, so the cap adds a Sort but NO extra shuffle (two Exchanges either way: (term, doc), then term). A hot term's aggregation buffer is bounded by the cap, not by its corpus frequency.",
       TextQueries.q75InvertedIndex(spark, d)),
      ("q77_curation_v2",
       "Curation composition: the persisted span table and the bigram aggregation each evaluated once, both filters reduce to semi-join shapes on doc_id, the split is a pure md5 projection, and the final datasheet is one keyed aggregation — five operators, still a single coherent plan with no operator-boundary materialization except the deliberate span-table cache.",
       TextQueries.q77CurationV2(spark, d)),
      ("q79_fuzzy_join",
       "Blocked fuzzy join: the composite block keys (nation, key-hash bucket) AND the Levenshtein length lower bound all ride the JOIN itself (SortMergeJoin/BHJ on the equi keys, length bound in the join condition — structural, not an optimizer courtesy); the edit-distance kernel is the THRESHOLDED levenshtein(l, r, maxDist) evaluated only on block-and-length survivors, and its DP early-exits at maxDist (r7: halved every ScaleProbe fuzzy row). No cartesian, no BNLJ.",
       RelationalQueries.q79FuzzyJoin(spark, d)),
      ("q80_quota_sample",
       "Quota sampling (window path): one shuffle on the stratum, row_number under the md5 content-hash total order, rank filter. Correct everywhere, but the per-stratum sort is a single task — see q84 for the hot-stratum sibling.",
       TextQueries.q80QuotaSample(spark, d)),
      ("q84_quota_sample_agg",
       "Quota sampling (bounded-agg path): the same sample as q80 computed by a typed top-k Aggregator — ObjectHashAggregate with a partial (map-side) phase whose state is <= k pairs per stratum, so per-stratum shuffle volume is #tasks x k and NO task sorts a whole stratum. No Window anywhere (asserted in PlanSpec).",
       TextQueries.q84QuotaSampleAgg(spark, d)),
      ("q81_normalize",
       "Text normalization (ASCII mode): lower + two regexp_replace + trim — one Project, zero Exchange, single WholeStageCodegen span.",
       TextQueries.q81Normalize(spark, d)),
      ("q83_normalize_unicode",
       "Text normalization (unicode mode): NFC composition via the codegen'd UnicodeNormalize expression (JDK Normalizer), then the same lower/strip/collapse pipeline with \\p{L}\\p{N} classes — still one Project, zero Exchange (asserted in PlanSpec); the NFC call sits INSIDE the WholeStageCodegen span.",
       TextQueries.q83NormalizeUnicode(spark, d)),
      ("q86_url_blocklist",
       "URL blocklist: hosts extracted ONCE (regexp_extract_all into an attribute — never recomputed inside the membership lambda), blocklist compiled to a codegen'd suffix-match — one Project, zero Exchange (asserted in PlanSpec).",
       TextQueries.q86UrlBlocklist(spark, d)),
      ("q88_paragraph_dedup",
       "Paragraph dedup: one persisted paragraph explode (InMemoryRelation) feeds the min first-owner aggregation (md5 digest group key — 16-byte shuffle rows, map-side partial min) and the digest join; survivors reassemble per doc via a sorted-struct-array aggregation bounded by each doc's own paragraph count. No Window, no Expand, never doc-pair-shaped.",
       TextQueries.q88ParagraphDedup(spark, d)),
      ("q90_incremental_dedup",
       "Incremental dedup: the increment's md5 projection LEFT ANTI joins the fingerprint store on 32-byte digests (historical text never scanned), then one keyed min aggregation keeps the first copy within the increment. At a history-scale store this is a digest-only shuffle; a small store broadcasts by size estimate (as here).",
       DedupQueries.q90IncrementalDedup(spark, d)),
      ("q85_bm25_batch",
       "BM25 batch arm (10k-term sweeps): corpus stats from a column-pruned id+length scan (1-row broadcast frame, the one legitimate BNLJ); the scoring pass explodes tokens and BroadcastHashJoins the deduplicated terms table, so non-matching tokens die at the probe — shuffled volume tracks matches, cost tracks corpus tokens, never query size. Final TakeOrderedAndProject partial top-k.",
       TextQueries.q85Bm25Batch(spark, d)),
      ("q96_strip_spans",
       "Boilerplate removal: one persisted positioned n-gram explode feeds the two-phase common-span agg (no Expand) and the coverage join; covered positions explode a span-length sequence and dedup on (doc, pos); survivors = token-grain LEFT ANTI join; reassembly = sorted-struct agg bounded by each doc's token count. Never doc-pair-shaped, no Window.",
       TextQueries.q96StripSpans(spark, d)),
      ("q92_lm_score",
       "Bigram-LM perplexity: ONE cached (pos,cur,prev) event explode (InMemoryRelation) feeds the unigram agg, the bigram agg, and both scoring branches; scoring joins hit the model tables on their keys (broadcast at this model size, plain shuffle hash joins at vocab scale) and the 1-row (N,V) stats frame broadcasts; final keyed agg per doc. No Window, no per-row UDF, model state bounded by vocab/bigram counts.",
       TextQueries.q92LmScore(spark, d)),
      ("q93_source_overlap",
       "Source overlap: distinct (source, shingle-hash) aggregation (map-side partial dedup), then a self-equi-join ON THE SHINGLE HASH — per-key rows bounded by #sources, so candidate blowup is structurally impossible; the per-source size table broadcasts twice. Jaccard is a projection over exact longs.",
       DedupQueries.q93SourceOverlap(spark, d)),
      ("q95_diversity_sample",
       "Diversity sample: centroid matrix rides as a literal in one argmax Project (no corpus x centroid explode), then the bounded-state quota draw — ObjectHashAggregate whose partial state is <= perCluster pairs per cluster, one stratum shuffle, no Window.",
       AnnQueries.q95DiversitySample(spark, d)),
      ("q94_bpe_encode",
       "BPE encode (train is a driver LOOP, not one plan: numMerges rounds of vocab-sized pair aggs, localCheckpoint lineage truncation, a 1-row argmax collect per round). The encode plan here: greedy merge UDF runs once per DISTINCT word over the aggregated dictionary — never corpus rows; docs explode tokens and equi-join the dictionary (broadcast at this size); final per-doc keyed agg.",
       { val docs = graft.Tables.documents(spark, d)
         graft.operators.Bpe.bpeEncode(docs, "doc_id", "text",
           graft.operators.Bpe.bpeTrain(docs, "text", numMerges = 20)) }))
    val sb = new StringBuilder
    sb.append("# PLANS — annotated `.explain(\"formatted\")` for headline queries\n\n")
    sb.append("> Regenerate: `sbt \"runMain graft.tools.DumpPlans\"` (written by that main).\n")
    sb.append("> The properties called out here are asserted in `PlanSpec` so they cannot silently regress.\n\n")
    entries.foreach { case (name, note, df) =>
      sb.append(s"## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim.take(4000))
      sb.append("\n```\n\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("WROTE PLANS.md " + Files.size(Paths.get("PLANS.md")) + " bytes")
    spark.stop()
  }
}
