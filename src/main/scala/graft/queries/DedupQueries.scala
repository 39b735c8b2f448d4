package graft.queries

import graft.Tables
import graft.operators.{Dedup, Relational, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication query pack — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup (LLM-pipeline surface; BASELINE.json
  * north star). Oracles are brute-force definitions of the same pair sets;
  * the Spark side must produce EXACTLY those pairs via prune+verify plans.
  */
object DedupQueries {

  // Exact dedup: corpus unioned with a shifted copy of itself; keep the
  // first (min doc_id) row per identical text.
  def q40DedupExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    Relational.keepFirstBy(doubled, Seq("text"), Seq(col("doc_id")), hashWideKeys = true)
      .select(col("doc_id"))
  }

  // MinHash+LSH near-dup pairs at Jaccard >= 0.6 on word 3-shingles.
  def q41DedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text", n = 3, minJaccard = 0.6)

  // Exact n-gram Jaccard pairs at >= 0.4 (inverted-index join, no LSH).
  def q42NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", n = 3, minJaccard = 0.4)

  // SimHash pairs within hamming distance 3 (pigeonhole-exact candidates).
  def q43Simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)

  // Embedding-cosine near-dup pairs at rounded cosine >= 0.45.
  def q44EmbedNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.45)

  // The 100-TB sibling of q44: banded-hyperplane CANDIDATES + exact-dot
  // verify instead of the tiled all-pairs join. Verify admits no false
  // positives and the band family is tuned so that on the seed-fixed gate
  // data it misses zero pairs at every SF (measured, not assumed), so the
  // output must EQUAL the exact pair set — it is cross-checked against
  // the same DuckDB all-pairs oracle as q44 (recall additionally asserted
  // vs the exact operator in SimilaritySpec).
  def q56EmbedNearDupCand(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupCandidates(Tables.embeddings(s, d), "vec_id", "embedding", 0.45)

  // Semantic decontamination (q69's embedding twin): every 25th vector,
  // deterministically perturbed (x[i] += 0.25·x[(i+1) mod d], then offset
  // ids by 1e6), plays the benchmark set — each ref lands ~0.97 cosine
  // from its source, so the 0.9 threshold finds exactly the planted
  // contamination and nothing from the ≤0.48 background. Banded
  // candidates + exact verify vs the exact cross-pairs DuckDB oracle.
  def q104EmbedDecontaminate(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val vd = col("embedding").cast("array<double>")
    val ref = e.filter(pmod(col("vec_id"), lit(25L)) === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(vd, (x, i) => x + lit(0.25) *
          element_at(vd, (pmod(i + 1, size(vd)) + 1).cast("int"))).as("embedding"))
    Similarity.crossNearDup(e, "vec_id", "embedding",
      ref, "vec_id", "embedding", minSim = 0.9)
  }

  // The dispatcher over q44/q56's operators: derives an LSH band family
  // from (threshold, target recall, corpus size) and picks exact-tiled vs
  // banded on the measured cost crossover (BASELINE.md probe: exact wins
  // at τ=0.45, banded at τ≥0.8 at scale). Both arms emit the same pair
  // set, so one DuckDB all-pairs oracle checks whichever arm fires — at
  // gate size (500-2k vectors) that is the exact arm; the banded arm and
  // the decision function are pinned across τ in SimilaritySpec.
  def q68EmbedNearDupAuto(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupAuto(Tables.embeddings(s, d), "vec_id", "embedding", 0.45)

  // Eval-set decontamination: corpus docs sharing >= 3 distinct 3-gram
  // shingles with any held-out eval doc (doc_id % 50 == 0 plays the eval
  // set) — the train/test-overlap sweep run before training.
  def q69Decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Dedup.crossContamination(
      docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
      n = 3, minShared = 3)
  }

  // Near-dup clusters: connected components over the exact Jaccard >= 0.4
  // pair graph; every clustered doc mapped to its minimum-id representative
  // (the keep-one-copy step of the dedup pipeline).
  def q45DedupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", n = 3, minJaccard = 0.4),
      "id_a", "id_b")

  // Embedding-modality twin of q45: connected components over the EXACT
  // cosine near-dup pair graph (q44's operator feeding q45's) — the
  // keep-one-copy step for semantic duplicates, oracle-replayed with a
  // recursive CTE over DuckDB's own cosine pairs.
  def q55EmbedClusters(s: SparkSession, d: String): DataFrame =
    Dedup.connectedComponents(
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.45),
      "id_a", "id_b")

  // The curation pipeline end-to-end (the LLM-training-data story in one
  // query): quality gate -> exact dedup (first per identical text) ->
  // near-dup pair detection -> cluster -> keep only representatives ->
  // per-language kept counts. Every stage is one of this engine's
  // operators; the oracle replays the identical pipeline in SQL.
  def q46CurationPipeline(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = Tables.documents(s, d)
      .filter(TextFunctions.qualityScore(col("text")) >= 0.75)
    // The deduped corpus feeds BOTH the pair-detection path (materialized
    // round by round inside connectedComponents) and the final anti-join —
    // without truncation the quality+dedup stages run twice. One
    // checkpoint, two consumers (a cluster job would persist to storage).
    val exact = graft.CacheScope.trackCheckpoint(
      Relational.keepFirstBy(docs, Seq("text"), Seq(col("doc_id")), hashWideKeys = true)
        .localCheckpoint())
    val pairs = Dedup.ngramJaccardPairs(exact, "doc_id", "text", n = 3, minJaccard = 0.4)
    val dups = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("rep")) // non-representative members
    exact.join(dups, exact("doc_id") === dups("id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"))
  }

  // Incremental exact dedup: docs with doc_id % 10 == 0 play "today's
  // crawl increment"; the rest are yesterday's corpus, present ONLY as
  // their md5 fingerprint store (the operator never touches historical
  // text). Kept = new-against-history AND first-within-increment.
  def q90IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val seen = docs.filter(col("doc_id") % 10 =!= 0)
      .select(md5(col("text")).as("fp")).distinct()
    Dedup.incrementalDedup(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", seen, "fp")
  }

  // Incremental NEAR-dup (q90's sibling): doc_id % 10 == 0 plays today's
  // increment; the rest exists ONLY as its hashed-shingle store (arrays
  // of 60-bit shingle hashes — text never rescanned). Flag = 3-gram
  // Jaccard >= 0.4 against any historical doc; the oracle recomputes the
  // same pairs from raw history text.
  def q106IncrementalNearDup(s: SparkSession, d: String): DataFrame = {
    import graft.catalyst.ShingleExprs
    import graft.functions.TextFunctions
    val docs = Tables.documents(s, d)
    val store = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        ShingleExprs.shingleHashes(TextFunctions.tokens(col("text")), 3).as("shingles"))
    Dedup.incrementalNearDup(docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", store, "doc_id", "shingles", n = 3, minJaccard = 0.4)
  }

  // Exact-substring dedup coverage (Lee et al. 2022's ExactSubstr grain):
  // per document, the maximal character spans covered by corpus-repeated
  // substrings >= 40 chars — the exact removal set an ExactSubstr pass
  // would drop. 40 is the Lee-et-al-shaped threshold scaled to the gate
  // corpus's doc lengths (their 50 targets web-crawl docs).
  def q225ExactSubstring(s: SparkSession, d: String): DataFrame =
    Dedup.exactSubstringSpans(Tables.documents(s, d), "doc_id", "text", minLen = 40)

  // Pairwise source overlap (dataset governance): exact bigram-shingle
  // Jaccard per source pair — 20 sources, 190 pairs, natural cross-source
  // bigram overlap ~500 shingles per pair at the gate SF.
  def q93SourceOverlap(s: SparkSession, d: String): DataFrame =
    Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", n = 2)

  // Split-leakage audit: near-dup pairs (q42's exact pair set) that
  // straddle the content-hash train/valid/test split (q58's cuts) —
  // the contamination a hash split cannot prevent for NEAR-duplicates.
  def q111SplitLeakage(s: SparkSession, d: String): DataFrame =
    Dedup.splitLeakage(Tables.documents(s, d), "doc_id", "text",
      cuts = Seq("train" -> 80, "valid" -> 90, "test" -> 100),
      n = 3, minJaccard = 0.4)

  // Quality-aware dedup retention: per near-dup cluster keep the row
  // with the most content (n_chars desc, id asc) — the curation rule
  // (keep the BEST copy), vs the keep-lowest-id convention elsewhere.
  def q120DedupKeepBest(s: SparkSession, d: String): DataFrame =
    Dedup.dedupKeepBest(Tables.documents(s, d), "doc_id", "text",
        "n_chars", n = 3, minJaccard = 0.4)
      .select("cluster_rep", "doc_id", "n_chars")

  // ROUGE-1/2 P/R/F between the members of every q42 near-dup pair — the
  // eval-harness overlap metric computed corpus-side, multiset-clipped
  // per the ROUGE definition, integer micro-units only.
  def q134Rouge(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
    graft.operators.TextOps.rougeScores(docs, "doc_id", "text",
      pairs, "id_a", "id_b", ns = Seq(1, 2))
  }

  // BLEU-2 over the same q42 near-dup pair set as q134 — candidate = id_a,
  // reference = id_b: the generation-eval mirror of ROUGE (clipped
  // precisions + brevity penalty + geometric mean), integer micro-units.
  def q181Bleu(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
    graft.operators.TextOps.bleuScores(docs, "doc_id", "text",
      pairs, "id_a", "id_b")
  }

  // chrF over the q134/q181 pair set — the tokenization-free eval
  // metric (character n-grams, n = 1..3, beta = 2): candidate = id_a,
  // reference = id_b.
  def q182Chrf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
    graft.operators.TextOps.chrfScores(docs, "doc_id", "text",
      pairs, "id_a", "id_b", maxN = 3)
  }

  // Token-level F1 + exact match (SQuAD answer scoring) over the same
  // pair set — every metric an exact integer, no doubles anywhere.
  def q183TokenF1(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
    graft.operators.TextOps.tokenF1Scores(docs, "doc_id", "text",
      pairs, "id_a", "id_b")
  }

  // PRODUCTION arm of the IVF near-dup pair stage (the q221 move applied
  // to PAIRS — r11 verdict item 3): probe-cell candidates + exact cosine
  // verify at tau=0.45, the threshold where hyperplane banding degenerates
  // (candidateFraction 0.889). O(N^1.5) candidate mass at kCells=sqrt(N),
  // indifferent to where the similarity mass sits; the full approximate
  // pair set replays bit-for-bit in DuckDB (partition replay + verify).
  // q44 stays the exact audit arm of this threshold.
  def q223IvfNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.ivfNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.45)

  // Curation v6 — the graph-era operators composed end to end: near-dup
  // pairs -> connected components -> PageRank centrality over the kNN
  // graph -> keep the most CENTRAL member of every duplicate cluster
  // (tie: smallest id). "Keep best" upgraded from the q120 scalar-quality
  // rule to a graph prior: the survivor is the most prototypical
  // document, not just the longest.
  //
  // Since r11 the PageRank prior rides the PRODUCTION edge build
  // (Similarity.ivfKnnGraph, q221). Since r12 the CLUSTER stage rides the
  // PRODUCTION pair build too (Similarity.ivfNearDupPairs, q223): the
  // exact tiled pairs this stage inherited were quadratic at the gate's
  // tau=0.45 — 208 of its 248 sf1 seconds, a 23x sf0.1->sf1 ratio (the
  // r11 verdict's last scale flag). Banding is NOT the fix at this
  // threshold (candidateFraction 0.889, the q68 dispatcher's measured
  // decision); IVF-cell candidates prune by partition instead. The exact
  // pair set remains audited by q44/q55 (same threshold, exact arms).
  def q135CurationV6(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val clusters = Dedup.connectedComponents(
      Similarity.ivfNearDupPairs(emb, "vec_id", "embedding", 0.45), "id_a", "id_b")
    val pr = graft.operators.Graph.pageRank(
      Similarity.ivfKnnGraph(emb, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id"),
      "query_id", "neighbor_id", iterations = 12)
    emb.select(col("vec_id"))
      .join(clusters.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("cluster", coalesce(col("rep"), col("vec_id")))
      .join(pr.withColumnRenamed("node_id", "vec_id"), Seq("vec_id"))
      .groupBy(col("cluster"))
      .agg(
        max_by(
          struct(col("vec_id").as("kept_id"), col("rank_micro").as("kept_rank_micro")),
          struct(col("rank_micro"), (-col("vec_id")).as("_n"))).as("_k"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster"), col("_k.kept_id").as("kept_id"),
        col("_k.kept_rank_micro").as("kept_rank_micro"), col("cluster_size"))
  }

  // Leakage-free split: split drawn from the near-dup CLUSTER
  // representative's hash — near-duplicates can never straddle splits
  // (the corrective action for the q111 audit's findings).
  def q139DedupAwareSplit(s: SparkSession, d: String): DataFrame =
    Dedup.dedupAwareSplit(Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", n = 3, minJaccard = 0.4,
        Seq("train" -> 80, "valid" -> 90, "test" -> 100))
      .select("doc_id", "cluster_rep", "split")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_rouge" -> q134Rouge,
    "q181_bleu" -> q181Bleu,
    "q182_chrf" -> q182Chrf,
    "q183_token_f1" -> q183TokenF1,
    "q139_dedup_aware_split" -> q139DedupAwareSplit,
    "q135_curation_v6" -> q135CurationV6,
    "q120_dedup_keep_best" -> q120DedupKeepBest,
    "q111_split_leakage" -> q111SplitLeakage,
    "q93_source_overlap" -> q93SourceOverlap,
    "q90_incremental_dedup" -> q90IncrementalDedup,
    "q40_dedup_exact" -> q40DedupExact,
    "q41_dedup_minhash" -> q41DedupMinhash,
    "q42_ngram_jaccard" -> q42NgramJaccard,
    "q43_simhash" -> q43Simhash,
    "q44_embed_neardup" -> q44EmbedNearDup,
    "q45_dedup_clusters" -> q45DedupClusters,
    "q46_curation_pipeline" -> q46CurationPipeline,
    "q55_embed_clusters" -> q55EmbedClusters,
    "q56_embed_neardup_cand" -> q56EmbedNearDupCand,
    "q104_embed_decontaminate" -> q104EmbedDecontaminate,
    "q106_incremental_neardup" -> q106IncrementalNearDup,
    "q68_embed_neardup_auto" -> q68EmbedNearDupAuto,
    "q69_decontaminate" -> q69Decontaminate,
    "q223_ivf_neardup" -> q223IvfNearDup,
    "q225_exact_substring" -> q225ExactSubstring)

  /** q225 oracle, parameterized by an extra predicate on the COVERED
    * position rows (repeat counts always run over the FULL corpus): the
    * batch gate passes "" (all docs); the streaming twin q226 restricts
    * the OUTPUT to the increment slice with " AND doc_id % 10 = 0" while
    * inheriting identical full-corpus repeat semantics. */
  private[queries] def exactSubstringOracleSql(outputFilter: String): String =
    s"""WITH gr AS (
         SELECT doc_id, CAST(p AS BIGINT) AS p, substr(text, CAST(p AS INT), 40) AS gram
         FROM (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 39, 0))) AS p
               FROM documents)
       ),
       rep AS (SELECT gram FROM gr GROUP BY gram HAVING count(*) >= 2),
       cov AS (
         SELECT doc_id, p,
           p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
         FROM gr WHERE gram IN (SELECT gram FROM rep)$outputFilter
       )
       SELECT doc_id, CAST(min(p) AS BIGINT) AS start_pos,
         CAST(max(p) - min(p) + 40 AS BIGINT) AS span_len
       FROM cov GROUP BY doc_id, isl"""

  /** Word n-gram distinct shingle list in DuckDB. */
  private def shinglesSql(n: Int) =
    s"""list_distinct(list_transform(
         generate_series(1, greatest(len(string_split(trim(text),' ')) - ${n - 1}, 0)),
         i -> array_to_string(string_split(trim(text),' ')[i:i+${n - 1}], ' ')))"""

  /** Brute-force cosine pair set at >= 0.45 — the shared oracle for the
    * exact (q44) and candidates+verify (q56) operators.
    *
    * Still O(N²) BY CONTRACT (these are the exhaustive audit arms), but
    * r15 moves the replay from `DOUBLE[]` lists to DuckDB's fixed-size
    * `DOUBLE[64]` arrays (the TESTDATA.md embedding width):
    * `array_cosine_similarity` is SIMD-vectorized where the list form
    * is interpreted per element, and the similarity is computed ONCE in
    * a CTE instead of twice (WHERE + SELECT). Verified bit-identical to
    * the list form at sf0.1 (same double arithmetic, same round), and
    * it brings the sf1 replay (2·10⁸ pairs) from cap-timeout to ~25 s —
    * the gates certify at sf1 instead of riding the exclusion list. */
  private val cosinePairsOracleSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[64] AS v FROM embeddings),
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(array_cosine_similarity(a.v, b.v), 5) AS sim
             FROM e a JOIN e b ON a.vec_id < b.vec_id)
       SELECT id_a, id_b, sim FROM p WHERE sim >= 0.45"""

  /** CTE fragment yielding `jp(id_a, id_b, jaccard)` — shared by the
    * pair gate (q42), the split-leakage audit (q111), and the metric
    * oracles (q134/q181/q182/q183) so a shingle or threshold change lands
    * in every oracle or in none.
    *
    * Sub-quadratic since r14 (VERDICT r13 item 3): the original
    * `sh a JOIN sh b ON a.doc_id < b.doc_id` evaluated `list_intersect`
    * over all N²/2 doc pairs — a cap-timeout at sf1 (50k docs → 1.25G
    * intersections). This inverted-index form explodes the DISTINCT
    * shingle lists once and joins on shingle equality (Σ c_g² candidate
    * rows — 279M at sf1, ~2.5 min in DuckDB), then derives the SAME
    * jaccard from the intersection count and the two list sizes:
    * `|A∩B| / (|A| + |B| - |A∩B|)` over identical integers is the
    * bit-identical DOUBLE, and pairs with zero shared shingles (the only
    * rows the index never sees) have jaccard 0 < thr by definition. */
  private def jaccardCtesSql(n: Int, thr: Double) =
    s"""sh AS (SELECT doc_id, ${shinglesSql(n)} AS s FROM documents),
        shsz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS sz FROM sh),
        shex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        shiv AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS i
          FROM shex a JOIN shex b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jp AS (SELECT id_a, id_b,
            CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
          FROM shiv JOIN shsz sa ON sa.doc_id = shiv.id_a
            JOIN shsz sb ON sb.doc_id = shiv.id_b
          WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= $thr)"""

  private def jaccardPairsSql(n: Int, thr: Double) =
    s"""WITH ${jaccardCtesSql(n, thr)}
        SELECT id_a, id_b, jaccard FROM jp"""

  /** q134 oracle: multiset-clipped ROUGE-1/2 over the q42 pair set —
    * same shingle fragment as the pair gate, gram tables materialized
    * (each feeds totals + both match sides). */
  private val q134OracleSql: String = {
    def gramsSql(n: Int, name: String) =
      s"""$name AS MATERIALIZED (
           SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(t) - ${n - 1}, 0)),
               i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
             FROM toks) GROUP BY doc_id, g)"""
    def matchSql(n: Int) =
      s"""m$n AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
           FROM p JOIN g$n a ON a.doc_id = p.id_a
           JOIN g$n b ON b.doc_id = p.id_b AND b.g = a.g
           GROUP BY 1, 2)"""
    def prSql(n: Int) =
      s"""CASE WHEN coalesce(ta$n.t, 0) > 0
            THEN (1000000 * coalesce(m$n.m, 0)) // ta$n.t ELSE 0 END AS p$n,
          CASE WHEN coalesce(tb$n.t, 0) > 0
            THEN (1000000 * coalesce(m$n.m, 0)) // tb$n.t ELSE 0 END AS r$n"""
    s"""WITH ${jaccardCtesSql(3, 0.4)},
        p AS MATERIALIZED (SELECT id_a, id_b FROM jp),
        toks AS MATERIALIZED (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
          WHERE doc_id IN (SELECT id_a FROM p UNION SELECT id_b FROM p)),
        ${gramsSql(1, "g1")}, ${gramsSql(2, "g2")},
        t1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM g1 GROUP BY 1),
        t2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM g2 GROUP BY 1),
        ${matchSql(1)}, ${matchSql(2)},
        pr AS (SELECT p.id_a, p.id_b, ${prSql(1)}, ${prSql(2)}
          FROM p
          LEFT JOIN m1 ON m1.id_a = p.id_a AND m1.id_b = p.id_b
          LEFT JOIN t1 ta1 ON ta1.doc_id = p.id_a
          LEFT JOIN t1 tb1 ON tb1.doc_id = p.id_b
          LEFT JOIN m2 ON m2.id_a = p.id_a AND m2.id_b = p.id_b
          LEFT JOIN t2 ta2 ON ta2.doc_id = p.id_a
          LEFT JOIN t2 tb2 ON tb2.doc_id = p.id_b)
        SELECT id_a, id_b,
          p1 AS rouge1_p_micro, r1 AS rouge1_r_micro,
          CASE WHEN p1 + r1 > 0 THEN (2 * p1 * r1) // (p1 + r1) ELSE 0 END AS rouge1_f_micro,
          p2 AS rouge2_p_micro, r2 AS rouge2_r_micro,
          CASE WHEN p2 + r2 > 0 THEN (2 * p2 * r2) // (p2 + r2) ELSE 0 END AS rouge2_f_micro
        FROM pr"""
  }

  /** q181 oracle: BLEU-2 over the q134 gram tables — clipped precisions
    * on the CANDIDATE totals, brevity penalty on unigram lengths,
    * geometric mean micro-quantized (the q92 round-transcendental
    * convention). */
  private val q181OracleSql: String = {
    def gramsSql(n: Int, name: String) =
      s"""$name AS MATERIALIZED (
           SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(t) - ${n - 1}, 0)),
               i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
             FROM toks) GROUP BY doc_id, g)"""
    def matchSql(n: Int) =
      s"""m$n AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
           FROM p JOIN g$n a ON a.doc_id = p.id_a
           JOIN g$n b ON b.doc_id = p.id_b AND b.g = a.g
           GROUP BY 1, 2)"""
    s"""WITH ${jaccardCtesSql(3, 0.4)},
        p AS MATERIALIZED (SELECT id_a, id_b FROM jp),
        toks AS MATERIALIZED (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
          WHERE doc_id IN (SELECT id_a FROM p UNION SELECT id_b FROM p)),
        ${gramsSql(1, "g1")}, ${gramsSql(2, "g2")},
        t1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM g1 GROUP BY 1),
        t2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM g2 GROUP BY 1),
        ${matchSql(1)}, ${matchSql(2)},
        pr AS (SELECT p.id_a, p.id_b,
            coalesce(m1.m, 0) AS m1, coalesce(m2.m, 0) AS m2,
            coalesce(ta1.t, 0) AS ta1, coalesce(ta2.t, 0) AS ta2,
            coalesce(tb1.t, 0) AS tb1
          FROM p
          LEFT JOIN m1 ON m1.id_a = p.id_a AND m1.id_b = p.id_b
          LEFT JOIN m2 ON m2.id_a = p.id_a AND m2.id_b = p.id_b
          LEFT JOIN t1 ta1 ON ta1.doc_id = p.id_a
          LEFT JOIN t2 ta2 ON ta2.doc_id = p.id_a
          LEFT JOIN t1 tb1 ON tb1.doc_id = p.id_b),
        bpc AS (SELECT *, CASE WHEN ta1 >= tb1 THEN 1.0
            ELSE exp(1.0 - CAST(tb1 AS DOUBLE) / CAST(ta1 AS DOUBLE)) END AS bp
          FROM pr)
        SELECT id_a, id_b,
          CASE WHEN ta1 > 0 THEN (1000000 * m1) // ta1 ELSE 0 END AS bleu1_p_micro,
          CASE WHEN ta2 > 0 THEN (1000000 * m2) // ta2 ELSE 0 END AS bleu2_p_micro,
          CAST(round(1000000.0 * bp) AS BIGINT) AS bp_micro,
          CASE WHEN m1 > 0 AND m2 > 0 AND ta1 > 0 AND ta2 > 0
            THEN CAST(round(1000000.0 * bp * sqrt(
              (CAST(m1 AS DOUBLE) / ta1) * (CAST(m2 AS DOUBLE) / ta2))) AS BIGINT)
            ELSE 0 END AS bleu2_micro
        FROM bpc"""
  }

  /** q182 oracle: chrF over character-gram count tables — per-order
    * clipped precision/recall, arithmetic means over n = 1..3, F-beta
    * (beta = 2) in FIXED-order double arithmetic micro-quantized (the
    * q181 IEEE-replay convention). */
  private val q182OracleSql: String = {
    def charGramsSql(n: Int, name: String) =
      s"""$name AS MATERIALIZED (
           SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(length(s) - ${n - 1}, 0)),
               i -> substr(s, i, $n))) AS g
             FROM chars) GROUP BY doc_id, g)"""
    def matchSql(n: Int) =
      s"""cm$n AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
           FROM p JOIN cg$n a ON a.doc_id = p.id_a
           JOIN cg$n b ON b.doc_id = p.id_b AND b.g = a.g
           GROUP BY 1, 2)"""
    val fracs = (1 to 3).map { n =>
      s"""CASE WHEN coalesce(ta$n, 0) > 0
            THEN CAST(coalesce(m$n, 0) AS DOUBLE) / CAST(ta$n AS DOUBLE)
            ELSE 0.0 END AS p$n,
          CASE WHEN coalesce(tb$n, 0) > 0
            THEN CAST(coalesce(m$n, 0) AS DOUBLE) / CAST(tb$n AS DOUBLE)
            ELSE 0.0 END AS r$n"""
    }.mkString(",\n          ")
    s"""WITH ${jaccardCtesSql(3, 0.4)},
        p AS MATERIALIZED (SELECT id_a, id_b FROM jp),
        chars AS MATERIALIZED (
          SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS s FROM documents
          WHERE doc_id IN (SELECT id_a FROM p UNION SELECT id_b FROM p)),
        ${charGramsSql(1, "cg1")}, ${charGramsSql(2, "cg2")}, ${charGramsSql(3, "cg3")},
        ct1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM cg1 GROUP BY 1),
        ct2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM cg2 GROUP BY 1),
        ct3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM cg3 GROUP BY 1),
        ${matchSql(1)}, ${matchSql(2)}, ${matchSql(3)},
        pr AS (SELECT p.id_a, p.id_b,
            cm1.m AS m1, cm2.m AS m2, cm3.m AS m3,
            ta1.t AS ta1, ta2.t AS ta2, ta3.t AS ta3,
            tb1.t AS tb1, tb2.t AS tb2, tb3.t AS tb3
          FROM p
          LEFT JOIN cm1 ON cm1.id_a = p.id_a AND cm1.id_b = p.id_b
          LEFT JOIN cm2 ON cm2.id_a = p.id_a AND cm2.id_b = p.id_b
          LEFT JOIN cm3 ON cm3.id_a = p.id_a AND cm3.id_b = p.id_b
          LEFT JOIN ct1 ta1 ON ta1.doc_id = p.id_a
          LEFT JOIN ct2 ta2 ON ta2.doc_id = p.id_a
          LEFT JOIN ct3 ta3 ON ta3.doc_id = p.id_a
          LEFT JOIN ct1 tb1 ON tb1.doc_id = p.id_b
          LEFT JOIN ct2 tb2 ON tb2.doc_id = p.id_b
          LEFT JOIN ct3 tb3 ON tb3.doc_id = p.id_b),
        fr AS (SELECT id_a, id_b, $fracs FROM pr),
        avgs AS (SELECT id_a, id_b,
            (p1 + p2 + p3) / 3.0 AS pa, (r1 + r2 + r3) / 3.0 AS ra
          FROM fr)
        SELECT id_a, id_b,
          CAST(round(1000000.0 * pa) AS BIGINT) AS chrf_p_micro,
          CAST(round(1000000.0 * ra) AS BIGINT) AS chrf_r_micro,
          CASE WHEN 4.0 * pa + ra > 0
            THEN CAST(round(1000000.0 * (5.0 * pa * ra / (4.0 * pa + ra))) AS BIGINT)
            ELSE 0 END AS chrf_micro
        FROM avgs"""
  }

  /** q183 oracle: unigram clipped overlap + the normalized-sequence
    * equality — every exported metric an exact integer floor division,
    * so the hash match is arithmetic identity. */
  private val q183OracleSql: String =
    s"""WITH ${jaccardCtesSql(3, 0.4)},
        p AS MATERIALIZED (SELECT id_a, id_b FROM jp),
        toks AS MATERIALIZED (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
          WHERE doc_id IN (SELECT id_a FROM p UNION SELECT id_b FROM p)),
        u AS MATERIALIZED (
          SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY doc_id, g),
        ut AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM u GROUP BY 1),
        um AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
          FROM p JOIN u a ON a.doc_id = p.id_a
          JOIN u b ON b.doc_id = p.id_b AND b.g = a.g
          GROUP BY 1, 2),
        norm AS (SELECT doc_id, array_to_string(t, ' ') AS s FROM toks),
        pr AS (SELECT p.id_a, p.id_b,
            coalesce(um.m, 0) AS m, coalesce(ta.t, 0) AS ta, coalesce(tb.t, 0) AS tb,
            na.s AS sa, nb.s AS sb
          FROM p
          LEFT JOIN um ON um.id_a = p.id_a AND um.id_b = p.id_b
          LEFT JOIN ut ta ON ta.doc_id = p.id_a
          LEFT JOIN ut tb ON tb.doc_id = p.id_b
          JOIN norm na ON na.doc_id = p.id_a
          JOIN norm nb ON nb.doc_id = p.id_b)
        SELECT id_a, id_b,
          CASE WHEN ta > 0 THEN (1000000 * m) // ta ELSE 0 END AS f1_p_micro,
          CASE WHEN tb > 0 THEN (1000000 * m) // tb ELSE 0 END AS f1_r_micro,
          CASE WHEN ta + tb > 0 THEN (2000000 * m) // (ta + tb) ELSE 0 END AS f1_micro,
          CAST(sa = sb AS INT) AS exact
        FROM pr"""

  /** q135 oracle: the composition replayed — ONE IVF partition prefix
    * feeding both tails (kNN edges for the PageRank prior, probe-cell
    * near-dup pairs for the cluster stage — exactly the engine's shared
    * `ivfProbed`), unrolled PageRank (shared fragments with q108/q132),
    * recursive-CTE components (shared shape with q55), keep-most-central. */
  private val q135OracleSql: String =
    s"""WITH RECURSIVE ${AnnQueries.ivfFrCte},
        ${AnnQueries.ivfKnnTail},
        ${AnnQueries.ivfPairsTail(0.45)},
        ${GraphQueries.pageRankChainCtes},
        pairs AS (SELECT id_a, id_b FROM ivfpairs),
        edges2 AS (SELECT id_a AS x, id_b AS y FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
        walk(id, rep) AS (
          SELECT x, x FROM (SELECT DISTINCT x FROM edges2) t
          UNION
          SELECT e2.x, w.rep FROM edges2 e2 JOIN walk w ON w.id = e2.y),
        cc AS (SELECT id, min(rep) AS rep FROM walk GROUP BY id),
        base AS MATERIALIZED (
          SELECT em.vec_id, coalesce(cc.rep, em.vec_id) AS cluster, r.r AS rank_micro
          FROM embeddings em
          LEFT JOIN cc ON cc.id = em.vec_id
          JOIN r12 r ON r.id = em.vec_id),
        sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
               FROM base GROUP BY 1),
        keep AS (SELECT cluster, vec_id AS kept_id, rank_micro AS kept_rank_micro
                 FROM base
                 QUALIFY row_number() OVER (PARTITION BY cluster
                   ORDER BY rank_micro DESC, vec_id) = 1)
        SELECT k.cluster, k.kept_id, k.kept_rank_micro, s.cluster_size
        FROM keep k JOIN sz s USING (cluster)"""

  val oracles: Map[String, String] = Map(
    "q134_rouge" -> q134OracleSql,
    "q181_bleu" -> q181OracleSql,
    "q182_chrf" -> q182OracleSql,
    "q183_token_f1" -> q183OracleSql,
    "q139_dedup_aware_split" ->
      s"""WITH RECURSIVE ${jaccardCtesSql(3, 0.4)},
          pairs AS (SELECT id_a, id_b FROM jp),
          edges AS (SELECT id_a AS x, id_b AS y FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          walk(id, rep) AS (
            SELECT x, x FROM (SELECT DISTINCT x FROM edges) t
            UNION
            SELECT e.x, w.rep FROM edges e JOIN walk w ON w.id = e.y
          ),
          cc AS (SELECT id, min(rep) AS rep FROM walk GROUP BY id),
          r AS (SELECT d.doc_id, coalesce(cc.rep, d.doc_id) AS cluster_rep
                FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
          b AS (SELECT doc_id, cluster_rep,
                  ('0x' || substring(md5(CAST(cluster_rep AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
                FROM r)
          SELECT doc_id, cluster_rep,
            CASE WHEN bucket < 80 THEN 'train'
                 WHEN bucket < 90 THEN 'valid'
                 ELSE 'test' END AS split
          FROM b""",
    "q135_curation_v6" -> q135OracleSql,
    "q223_ivf_neardup" ->
      s"""WITH ${AnnQueries.ivfPairsCte(0.45)}
          SELECT id_a, id_b, sim FROM ivfpairs""",
    "q120_dedup_keep_best" ->
      s"""WITH RECURSIVE ${jaccardCtesSql(3, 0.4)},
          pairs AS (SELECT id_a, id_b FROM jp),
          edges AS (SELECT id_a AS x, id_b AS y FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          walk(id, rep) AS (
            SELECT x, x FROM (SELECT DISTINCT x FROM edges) t
            UNION
            SELECT e.x, w.rep FROM edges e JOIN walk w ON w.id = e.y
          ),
          comp AS (SELECT id, min(rep) AS rep FROM walk GROUP BY id),
          tagged AS (
            SELECT COALESCE(c.rep, d.doc_id) AS cluster_rep, d.doc_id, d.n_chars
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
          SELECT cluster_rep, doc_id, n_chars FROM (
            SELECT *, row_number() OVER (
              PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id) AS rn
            FROM tagged) WHERE rn = 1""",
    "q111_split_leakage" ->
      s"""WITH ${jaccardCtesSql(3, 0.4)},
         sp AS (
           SELECT doc_id,
             CASE WHEN ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 80 THEN 'train'
                  WHEN ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT jp.id_a, jp.id_b, jp.jaccard,
           sa.split AS split_a, sb.split AS split_b
         FROM jp
         JOIN sp sa ON sa.doc_id = jp.id_a
         JOIN sp sb ON sb.doc_id = jp.id_b
         WHERE sa.split <> sb.split""",
    "q93_source_overlap" ->
      """WITH t AS (SELECT source, string_split(trim(text), ' ') AS toks FROM documents),
         g AS (SELECT DISTINCT source, array_to_string(toks[k.k + 1 : k.k + 2], ' ') AS sh
               FROM t JOIN (SELECT unnest(generate_series(0,
                 (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
                 ON k.k <= len(toks) - 2),
         sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY source),
         iv AS (SELECT a.source AS source_a, b.source AS source_b,
                  CAST(count(*) AS BIGINT) AS intersection
                FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
                GROUP BY 1, 2)
         SELECT iv.source_a, iv.source_b, sa.sz AS size_a, sb.sz AS size_b,
           iv.intersection, sa.sz + sb.sz - iv.intersection AS union_size,
           CAST(round(1000000.0 * CAST(iv.intersection AS DOUBLE) /
             CAST(sa.sz + sb.sz - iv.intersection AS DOUBLE)) AS BIGINT) AS jaccard_micro
         FROM iv JOIN sz sa ON iv.source_a = sa.source
           JOIN sz sb ON iv.source_b = sb.source""",
    "q40_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id
         FROM (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 100000, text FROM documents)
         GROUP BY text""",
    "q41_dedup_minhash" -> jaccardPairsSql(3, 0.6),
    "q42_ngram_jaccard" -> jaccardPairsSql(3, 0.4),
    "q43_simhash" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
         ), bits AS (
           SELECT doc_id, b,
             sum(CASE WHEN (('0x' || substring(md5(tok), 1, 16))::UBIGINT >> b) & 1 = 1
                 THEN 1 ELSE -1 END) AS score
           FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bs
           GROUP BY doc_id, b
         ), hashes AS (
           SELECT doc_id,
             sum(CASE WHEN score > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT AS h
           FROM bits GROUP BY doc_id
         ),
         -- pigeonhole banding (r14, sub-quadratic): hamming <= 3 over 4
         -- disjoint 16-bit chunks forces at least one chunk EQUAL, so the
         -- band equi-join yields every qualifying pair (the engine's own
         -- q43 candidate contract) and the bit_count verify drops the rest
         bands AS (SELECT doc_id, h, k, (h >> (k * 16)) & 65535::UBIGINT AS band
                   FROM hashes CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, a.h AS ha, b.doc_id AS id_b, b.h AS hb
                  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band
                    AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(ha, hb)) <= 3""",
    "q44_embed_neardup" -> cosinePairsOracleSql,
    // q56's candidates+verify path must reproduce the exact pair set —
    // same oracle as q44 by design.
    "q56_embed_neardup_cand" -> cosinePairsOracleSql,
    // character-grain stride-1 40-gram coverage islands, replayed
    // relationally: both engines' length/substr are code-point based and
    // positions are exact integers, so span bounds hash-match bit-for-bit
    "q225_exact_substring" -> exactSubstringOracleSql(""),
    // inverted-index form (r14): the inc × hist `list_intersect` join was
    // on the ×10-clone-density sf1 exclusion list; exploded-shingle
    // equality join + count gives the bit-identical jaccard (same
    // integers through the same DOUBLE division), output-sensitively
    "q106_incremental_neardup" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM documents),
         ix AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS sz, unnest(s) AS g
                FROM sh WHERE doc_id % 10 = 0),
         hx AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS sz, unnest(s) AS g
                FROM sh WHERE doc_id % 10 <> 0),
         iv AS (SELECT ix.doc_id AS inc_id, hx.doc_id AS hist_id,
             CAST(count(*) AS BIGINT) AS i,
             any_value(ix.sz) AS sa, any_value(hx.sz) AS sb
           FROM ix JOIN hx ON ix.g = hx.g GROUP BY 1, 2)
         SELECT inc_id, hist_id,
           CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) AS jaccard
         FROM iv WHERE CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) >= 0.4""",
    "q104_embed_decontaminate" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         r AS (SELECT vec_id + 1000000 AS ref_id,
                 list_transform(generate_series(1, len(v)),
                   i -> v[i] + 0.25 * v[(i % len(v)) + 1]) AS rv
               FROM e WHERE vec_id % 25 = 0)
         SELECT e.vec_id AS corpus_id, r.ref_id,
           round(list_cosine_similarity(e.v, r.rv), 5) AS sim
         FROM e JOIN r ON round(list_cosine_similarity(e.v, r.rv), 5) >= 0.9""",
    // the dispatcher must reproduce the same pair set whichever arm fires
    "q68_embed_neardup_auto" -> cosinePairsOracleSql,
    // distinct string-shingle intersection counts replay the hashed
    // operator exactly (same no-collision assumption as q42)
    "q90_incremental_dedup" ->
      """WITH hist AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 10 <> 0),
          inc AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 = 0),
          new AS (SELECT i.doc_id, i.fp FROM inc i ANTI JOIN hist h USING (fp))
          SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp
          FROM new GROUP BY fp""",
    // inverted-index form (r14): the corpus × eval `list_intersect` join
    // was the r8 "60-minute oracle" at sf1; joining exploded DISTINCT
    // shingles on equality and counting gives the identical shared_ngrams
    // (both count distinct shared shingles), sub-quadratically (14 s sf1)
    "q69_decontaminate" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM documents),
          cx AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0),
          ex AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
          shared AS (SELECT cx.doc_id AS doc_id, ex.doc_id AS eval_id,
              CAST(count(*) AS BIGINT) AS shared_ngrams
            FROM cx JOIN ex ON cx.g = ex.g GROUP BY 1, 2)
          SELECT doc_id, eval_id, shared_ngrams
          FROM shared WHERE shared_ngrams >= 3""",
    "q45_dedup_clusters" ->
      s"""WITH RECURSIVE ${jaccardCtesSql(3, 0.4)},
          pairs AS (SELECT id_a, id_b FROM jp),
          edges AS (SELECT id_a AS x, id_b AS y FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          walk(id, rep) AS (
            SELECT x, x FROM (SELECT DISTINCT x FROM edges) t
            UNION
            SELECT e.x, w.rep FROM edges e JOIN walk w ON w.id = e.y
          )
          SELECT id, min(rep) AS rep FROM walk GROUP BY id""",
    // pair stage: same fixed-array SIMD replay as cosinePairsOracleSql
    // (r15 — verified bit-identical to the list form at sf0.1)
    "q55_embed_clusters" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[64] AS v FROM embeddings),
          sc AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(array_cosine_similarity(a.v, b.v), 5) AS sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
          ),
          pairs AS (SELECT id_a, id_b FROM sc WHERE sim >= 0.45),
          edges AS (SELECT id_a AS x, id_b AS y FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          walk(id, rep) AS (
            SELECT x, x FROM (SELECT DISTINCT x FROM edges) t
            UNION
            SELECT e2.x, w.rep FROM edges e2 JOIN walk w ON w.id = e2.y
          )
          SELECT id, min(rep) AS rep FROM walk GROUP BY id""",
    "q46_curation_pipeline" -> {
      val stopSql = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(",")
      s"""WITH RECURSIVE q AS (
            SELECT doc_id, text, lang FROM (
              SELECT doc_id, text, lang,
                ((CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN CAST(len(list_filter(string_split(trim(text), ' '), t -> t IN ($stopSql))) AS DOUBLE)
                         / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) > 0.01 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                         / CAST(length(text) AS DOUBLE) < 0.1 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN CAST(length(text) AS DOUBLE) / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) >= 2.0
                         AND CAST(length(text) AS DOUBLE) / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) <= 12.0
                        THEN 1.0 ELSE 0.0 END)) * 0.25 AS quality
              FROM documents)
            WHERE quality >= 0.75
          ), ex AS (
            SELECT doc_id, text, lang FROM q
            QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
          ), sh AS (
            SELECT doc_id, ${shinglesSql(3)} AS s FROM ex
          ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.4
          ), edges AS (
            SELECT id_a AS x, id_b AS y FROM pairs UNION SELECT id_b, id_a FROM pairs
          ), walk(id, rep) AS (
            SELECT x, x FROM (SELECT DISTINCT x FROM edges) t
            UNION
            SELECT e.x, w.rep FROM edges e JOIN walk w ON w.id = e.y
          ), dups AS (
            SELECT id FROM (SELECT id, min(rep) AS rep FROM walk GROUP BY id) WHERE rep <> id
          )
          SELECT lang, count(*) AS n_kept FROM ex
          WHERE doc_id NOT IN (SELECT id FROM dups)
          GROUP BY lang"""
    })
}
