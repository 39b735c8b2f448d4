package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity-search query pack over `embeddings` (LLM-pipeline ANN
  * surface). The brute-force top-k is the oracle-verified baseline; the
  * LSH-bucketed variant is the approximate scale path (no SQL oracle —
  * recall measured against brute force in the spec instead).
  */
object AnnQueries {

  private def queriesSubset(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 100 === 0)

  // Exact cosine top-5 neighbors for each query vector.
  def q50AnnBrute(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(
      Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", k = 5)

  // LSH-bucketed approximate top-5 (random hyperplane sketches).
  def q51AnnLsh(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopK(
      Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      k = 5, nBits = 16, bands = 4)

  // Sketch-family coverage: approximate distinct + frequency sketch outputs
  // (engine-side only; no cross-engine oracle for approximations).
  def q52ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))

  // Sketch audit for q52: the exact distinct counts hash-gated, plus the
  // HLL outputs re-stated as integer accuracy flags (|approx − exact| ≤
  // 15% of exact — 3× the sketch's 5% rsd; the observed gate error is
  // ≤ ~6.5%). The sketch value itself stays out of the hash — it is
  // engine-specific by design; its ACCURACY CONTRACT is not.
  def q52aDistinctExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        approx_count_distinct(col("l_partkey")).as("_ap"),
        approx_count_distinct(col("l_orderkey")).as("_ao"))
      .select(col("l_returnflag"), col("n_parts"), col("n_orders"),
        (abs(col("_ap") - col("n_parts")) * 100 <= col("n_parts") * 15)
          .cast("int").as("parts_within_15pct"),
        (abs(col("_ao") - col("n_orders")) * 100 <= col("n_orders") * 15)
          .cast("int").as("orders_within_15pct"))

  // IVF-bucketed approximate top-5 (coarse quantizer + probe): the second
  // ANN scale path next to LSH. Recall vs q50 measured in the spec.
  def q53AnnIvf(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(
      Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)

  // int8 embedding quantization (compression-for-shipping): scale, code
  // checksum, and reconstruction error per vector — all IEEE-deterministic
  // arithmetic, hash-checked against a DuckDB list-algebra replay.
  def q57EmbedQuantize(s: SparkSession, d: String): DataFrame =
    graft.operators.Embeddings.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")

  // Product-quantization two-stage ANN (compressed scan -> exact rerank):
  // the 32x-memory-compression scale path next to LSH (q51) and IVF
  // (q53). Approximate by design -> rows-only check; recall floors
  // asserted in EmbeddingsSpec.
  def q66AnnPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = graft.operators.Embeddings.pqTrain(emb, "vec_id", "embedding", m = 8, k = 32, iters = 2)
    graft.operators.Embeddings.pqTopKRerank(
      emb, queriesSubset(s, d), "vec_id", "embedding", k = 5, shortlist = 100, cb)
  }

  // IVF-PQ composed index (coarse inverted lists + residual PQ codes +
  // exact rerank): the production 100-TB ANN shape — the scan touches
  // codes of nprobe/nlist of the corpus, full vectors only for
  // queries x shortlist rows. Approximate -> rows-only check; recall and
  // reconstruction laws vs standalone PQ asserted in EmbeddingsSpec.
  def q67AnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val model = graft.operators.Embeddings.ivfPqTrain(
      emb, "vec_id", "embedding", nlist = 16, m = 8, k = 32, iters = 2)
    graft.operators.Embeddings.ivfPqTopKRerank(
      emb, queriesSubset(s, d), "vec_id", "embedding",
      k = 5, nprobe = 8, shortlist = 100, model)
  }

  // PCA dimensionality reduction as the FOURTH ANN scale path (next to
  // LSH buckets, IVF lists, PQ codes): shortlist in the top-16-axis
  // subspace (16/64 of the scan arithmetic), exact-rerank the shortlist.
  // Approximate -> rows-only check; orthonormality, monotone
  // reconstruction error and the recall floor asserted in EmbeddingsSpec.
  def q91AnnPca(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val model = graft.operators.Embeddings.pcaTrain(emb, "vec_id", "embedding", kDims = 16)
    graft.operators.Embeddings.pcaTopKRerank(
      emb, queriesSubset(s, d), "vec_id", "embedding", k = 5, shortlist = 100, model)
  }

  // Semantic-diversity sample: 8 k-means clusters over the embedding
  // space, 5 content-hash-ordered rows kept per cluster — deterministic
  // but k-means is not SQL-replayable → rows-only gate; the balance and
  // determinism laws live in EmbeddingsSpec.
  def q95DiversitySample(s: SparkSession, d: String): DataFrame =
    graft.operators.Embeddings.diversitySample(
      Tables.embeddings(s, d), "vec_id", "embedding", nClusters = 8, perCluster = 5)

  // ---- audit gates (round 8): driver-green signals for the approximate
  // family. Each approximate gate keeps its production operating point
  // (rows-only) and gains a companion whose output IS oracle-checkable:
  // either the operator driven to a provably-exact configuration (IVF
  // probing every list; PQ/IVF-PQ/PCA rerank with a corpus-covering
  // shortlist — stage 2 is exact, so the result equals brute force
  // REGARDLESS of codebook quality) or the spec's quantitative floors
  // re-computed as integer flags DuckDB can assert.

  // LSH recall audit: the SimilaritySpec floors (recall >= 0.3 at the
  // production banding, >= 0.9 at 1-bit bands) as driver-checked integer
  // flags, plus the exact truth-set size. Hash-seeded LSH is
  // deterministic, so a green run certifies the measured recall, not a
  // lucky draw.
  def q51aLshRecall(s: SparkSession, d: String): DataFrame = {
    // the truth set is quadratic by contract (it IS the brute-force
    // baseline) — cache it so the two LSH arms and the count share one
    // computation instead of three
    val exact = graft.CacheScope.track(
      q50AnnBrute(s, d).select("query_id", "neighbor_id").cache())
    def hits(bands: Int): Long =
      Similarity.lshTopK(
        Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
        k = 5, nBits = 16, bands = bands)
        .select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id")).count()
    val nTruth = exact.count()
    val (h4, h16) = (hits(4), hits(16))
    import s.implicits._
    Seq((nTruth,
      if (h4 * 10L >= 3L * nTruth) 1 else 0,
      if (h16 * 10L >= 9L * nTruth) 1 else 0))
      .toDF("n_truth", "recall30_ok", "recall90_ok")
  }

  // IVF exhaustive arm: nprobe == nlist probes every inverted list, so
  // the full train/assign/probe/score machinery must reproduce brute
  // force row-for-row — a hash gate over the whole IVF pipeline.
  def q53aIvfExhaustive(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(
      Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 16)

  // PQ exhaustive arm: a corpus-covering shortlist makes stage 2 (exact
  // rerank) see every row, so train/encode/decode/scan/rerank must
  // reproduce brute force exactly. Audit-only configuration — the
  // production point (q66) keeps shortlist << N.
  def q66aPqExhaustive(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count().toInt
    val cb = graft.operators.Embeddings.pqTrain(emb, "vec_id", "embedding", m = 8, k = 32, iters = 2)
    graft.operators.Embeddings.pqTopKRerank(
      emb, queriesSubset(s, d), "vec_id", "embedding", k = 5, shortlist = n, cb)
  }

  // IVF-PQ exhaustive arm: every list probed AND a corpus-covering
  // shortlist — the composed coarse+residual index must round-trip to
  // brute force exactly.
  def q67aIvfPqExhaustive(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count().toInt
    val model = graft.operators.Embeddings.ivfPqTrain(
      emb, "vec_id", "embedding", nlist = 16, m = 8, k = 32, iters = 2)
    graft.operators.Embeddings.ivfPqTopKRerank(
      emb, queriesSubset(s, d), "vec_id", "embedding",
      k = 5, nprobe = 16, shortlist = n, model)
  }

  // PCA exhaustive arm: subspace shortlist covering the corpus + exact
  // rerank == brute force, whatever the basis quality.
  def q91aPcaExhaustive(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count().toInt
    val model = graft.operators.Embeddings.pcaTrain(emb, "vec_id", "embedding", kDims = 16)
    graft.operators.Embeddings.pcaTopKRerank(
      emb, queriesSubset(s, d), "vec_id", "embedding", k = 5, shortlist = n, model)
  }

  // Diversity-sample audit: the draw-count contract as one checkable
  // row — 8 clusters × exactly 5 draws, every id distinct and a real
  // corpus id. K-means itself is not SQL-replayable; its BALANCE
  // contract is.
  def q95aDiversityAudit(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val samp = graft.operators.Embeddings.diversitySample(
      emb, "vec_id", "embedding", nClusters = 8, perCluster = 5)
    val per = samp.groupBy("cluster").agg(count(lit(1)).as("_draws"))
    val stats = samp.agg(
      count(lit(1)).as("n_rows"),
      count_distinct(col("vec_id")).as("n_distinct_ids"))
    val inCorpus = samp.join(emb.select("vec_id"), Seq("vec_id"))
      .agg(count(lit(1)).as("n_in_corpus"))
    val clusterStats = per.agg(
      count(lit(1)).as("n_clusters"),
      min(col("_draws")).as("min_draws"), max(col("_draws")).as("max_draws"))
    stats.crossJoin(inCorpus).crossJoin(clusterStats)
  }

  // Hybrid retrieval: BM25 (q72's 4-term query) + embedding cosine
  // (query-by-example, vec 0) fused by reciprocal rank — both arms and
  // the fusion are integer/rounded-deterministic, so the whole stack
  // replays in DuckDB.
  def q97HybridSearch(s: SparkSession, d: String): DataFrame =
    graft.operators.Hybrid.hybridSearch(
      Tables.documents(s, d), "doc_id", "text",
      Seq("spark", "hash", "merge", "window"),
      Tables.embeddings(s, d), "vec_id", "embedding", queryVecId = 0L,
      k = 10, kEach = 20)

  // Directed exact kNN graph (every vector is query AND corpus): tiled
  // self-join + bounded-state TopKPairsAgg per query — the self-join regime
  // where neither side broadcasts. Exact and integer-exported
  // (sim_micro) → full hash gate vs the DuckDB N² replay.
  def q108KnnGraph(s: SparkSession, d: String): DataFrame =
    Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)

  // PRODUCTION twin of q108 — the same k=3 kNN graph contract built by
  // the sub-quadratic IVF path (integer k-means partition, probe-cell
  // candidates, exact cosine re-rank). Every step integer/pinned-IEEE,
  // so the oracle replays the FULL approximate edge set bit-for-bit —
  // the graph-family a/b convention: q108 audits the exhaustive build,
  // q221 gates the one a 100-TB pipeline runs.
  def q221IvfKnnGraph(s: SparkSession, d: String): DataFrame =
    Similarity.ivfKnnGraph(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)

  // Hard-negative mining (contrastive training): per query, top-10
  // corpus rows in the cosine band [0.10, 0.45) — confusable but below
  // the q44 near-dup threshold, so a mined negative is never a positive.
  def q109HardNegatives(s: SparkSession, d: String): DataFrame =
    Similarity.hardNegatives(
      Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      k = 10, loSim = 0.10, hiSim = 0.45)

  // Contrastive pair export: per anchor, the single best match >= 0.30
  // (the positive) + top-4 hard negatives in [0.05, 0.30); anchors
  // without a positive emit nothing (InfoNCE-consumable as-is).
  def q114ContrastivePairs(s: SparkSession, d: String): DataFrame =
    Similarity.contrastivePairs(
      Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      posMin = 0.30, nNeg = 4, negLo = 0.05, negHi = 0.30)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51a_lsh_recall" -> q51aLshRecall,
    "q52a_distinct_exact" -> q52aDistinctExact,
    "q53a_ivf_exhaustive" -> q53aIvfExhaustive,
    "q66a_pq_exhaustive" -> q66aPqExhaustive,
    "q67a_ivfpq_exhaustive" -> q67aIvfPqExhaustive,
    "q91a_pca_exhaustive" -> q91aPcaExhaustive,
    "q95a_diversity_audit" -> q95aDiversityAudit,
    "q108_knn_graph" -> q108KnnGraph,
    "q221_ivf_knn_graph" -> q221IvfKnnGraph,
    "q109_hard_negatives" -> q109HardNegatives,
    "q114_contrastive_pairs" -> q114ContrastivePairs,
    "q97_hybrid_search" -> q97HybridSearch,
    "q95_diversity_sample" -> q95DiversitySample,
    "q91_ann_pca" -> q91AnnPca,
    "q50_ann_brute" -> q50AnnBrute,
    "q51_ann_lsh" -> q51AnnLsh,
    "q52_approx_distinct" -> q52ApproxDistinct,
    "q53_ann_ivf" -> q53AnnIvf,
    "q57_embed_quantize" -> q57EmbedQuantize,
    "q66_ann_pq" -> q66AnnPq,
    "q67_ann_ivfpq" -> q67AnnIvfPq)

  /** DuckDB CTE fragment yielding `knn(query_id, neighbor_id, sim_micro,
    * rnk)` — the k=3 cosine kNN graph replay shared by the q108 gate and
    * the graph-analytics oracles ([[GraphQueries]]), so a scoring or
    * tie-break change lands in every consumer or in none. */
  // r15: fixed-size DOUBLE[64] arrays (the TESTDATA.md embedding width)
  // so the exhaustive N² replay rides DuckDB's SIMD array kernel — same
  // double arithmetic, verified bit-identical to the list form at sf0.1;
  // at sf1 (4·10⁸ directed pairs) the replay fits the sweep cap (~100 s)
  // where the list form was a by-contract exclusion.
  private[queries] val knnEdges3Cte: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[64] AS v FROM embeddings),
       scored AS (
         SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(round(array_cosine_similarity(a.v, b.v) * 100000) AS BIGINT) AS sim_micro
         FROM e a JOIN e b ON a.vec_id <> b.vec_id
       ),
       knn AS MATERIALIZED (
         SELECT query_id, neighbor_id, sim_micro,
           row_number() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) AS rnk
         FROM scored
         QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) <= 3
       )"""

  /** DuckDB CTE fragment yielding `knn(query_id, neighbor_id, sim_micro,
    * rnk)` for the PRODUCTION (IVF) graph build — the exact-integer
    * replay of [[Similarity.ivfKnnGraph]] at the gate parameters (k=3,
    * 3 Lloyd rounds, nProbe=3, kCells=max(4, floor(√N))): quantized
    * vectors long-form, md5-bucket Forgy seeds, three unrolled
    * assign/re-center rounds (floor-division via the (s − pmod)/n
    * identity), then probe-cell candidates scored with the SAME
    * `round(list_cosine_similarity·1e5)` convention as [[knnEdges3Cte]].
    * Ends at the same `knn` shape, so the graph-loop oracles
    * ([[GraphQueries]]) consume either fragment unchanged. */
  /** DuckDB CTE fragment replaying [[Similarity.ivfProbed]]'s coarse
    * partition, ending at `fr(vec_id, cell, pr)` — pr = probe rank, pr=1
    * the home cell. Shared prefix of [[ivfKnn3Cte]] (kNN tail) and
    * [[ivfPairsCte]] (near-dup pair tail), so a partition change lands in
    * every IVF consumer or in none. */
  private[queries] val ivfFrCte: String = {
    val rounds = 3
    val sb = new StringBuilder
    sb ++= """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       ks AS (SELECT greatest(4, least(4096, CAST(floor(sqrt(count(*))) AS BIGINT))) AS kc FROM e),
       qv AS MATERIALIZED (SELECT vec_id, unnest(range(0, len(v))) AS d,
         CAST(round(unnest(v) * 1000000) AS BIGINT) AS q FROM e),
       bkt AS (SELECT vec_id, ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
           % (SELECT kc FROM ks) AS cell FROM e),
       s0 AS (SELECT cell, min(vec_id) AS sid FROM bkt GROUP BY 1),
       c0 AS MATERIALIZED (SELECT s0.cell, qv.d, qv.q AS c FROM s0 JOIN qv ON qv.vec_id = s0.sid)"""
    for (r <- 1 to rounds) {
      sb ++= s""",
        a$r AS MATERIALIZED (SELECT vec_id, cell FROM (
            SELECT qv.vec_id, c.cell, sum(c.c * (c.c - 2 * qv.q)) AS score
            FROM qv JOIN c${r - 1} c ON qv.d = c.d GROUP BY 1, 2)
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score, cell) = 1),
        u$r AS (SELECT a.cell, qv.d, CAST(sum(qv.q) AS BIGINT) AS s, count(*) AS n
            FROM a$r a JOIN qv ON qv.vec_id = a.vec_id GROUP BY 1, 2),
        c$r AS MATERIALIZED (SELECT p.cell, p.d,
            coalesce(CAST((u.s - (((u.s % u.n) + u.n) % u.n)) // u.n AS BIGINT), p.c) AS c
            FROM c${r - 1} p LEFT JOIN u$r u ON u.cell = p.cell AND u.d = p.d)"""
    }
    sb ++= s""",
      fr AS MATERIALIZED (SELECT vec_id, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY score, cell) AS pr FROM (
            SELECT qv.vec_id, c.cell, sum(c.c * (c.c - 2 * qv.q)) AS score
            FROM qv JOIN c$rounds c ON qv.d = c.d GROUP BY 1, 2))"""
    sb.toString
  }

  /** kNN tail over `fr` — exposed separately so a composite oracle
    * (q135) can ride ONE partition prefix with both tails. */
  private[queries] val ivfKnnTail: String =
    s"""cand AS (SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id
          FROM fr p JOIN fr m ON m.cell = p.cell AND m.pr = 1 AND m.vec_id <> p.vec_id
          WHERE p.pr <= 3),
      scored AS (SELECT c.query_id, c.neighbor_id,
          CAST(round(list_cosine_similarity(a.v, b.v) * 100000) AS BIGINT) AS sim_micro
          FROM cand c JOIN e a ON a.vec_id = c.query_id JOIN e b ON b.vec_id = c.neighbor_id),
      knn AS MATERIALIZED (
        SELECT query_id, neighbor_id, sim_micro,
          row_number() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) AS rnk
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) <= 3)"""

  private[queries] val ivfKnn3Cte: String = s"$ivfFrCte,\n      $ivfKnnTail"

  /** Near-dup pair tail over `fr` (see [[ivfKnnTail]]): probe-cell
    * candidate pairs deduped at the canonical (id_a < id_b) grain, exact
    * cosine verify at `minSim` in the 5-decimal convention. Ends at
    * `ivfpairs(id_a, id_b, sim)`. */
  private[queries] def ivfPairsTail(minSim: Double): String =
    s"""pcand AS (SELECT DISTINCT least(p.vec_id, m.vec_id) AS id_a,
          greatest(p.vec_id, m.vec_id) AS id_b
          FROM fr p JOIN fr m ON m.cell = p.cell AND m.pr = 1 AND m.vec_id <> p.vec_id
          WHERE p.pr <= 3),
      ivfpairs AS MATERIALIZED (SELECT id_a, id_b, sim FROM (
          SELECT c.id_a, c.id_b, round(list_cosine_similarity(a.v, b.v), 5) AS sim
          FROM pcand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b)
        WHERE sim >= $minSim)"""

  /** Full IVF near-dup pairs replay — q223's oracle. */
  private[queries] def ivfPairsCte(minSim: Double): String =
    s"$ivfFrCte,\n      ${ivfPairsTail(minSim)}"

  /** The exact cosine top-5 replay — q50's oracle, shared verbatim by
    * every exhaustive-arm audit gate (q53a/q66a/q67a/q91a must equal
    * brute force row-for-row, so they share its oracle). */
  private val exactTop5Sql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.qv, e.v), 5) AS sim
         FROM q JOIN e ON e.vec_id <> q.query_id
       )
       SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
       FROM scored
       QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5"""

  // q51/q52 production points stay approximate → rows-only checks; their
  // audit companions (q51a/q53a/q66a/q67a/q91a/q95a) carry full oracles.
  val oracles: Map[String, String] = Map(
    "q53a_ivf_exhaustive" -> exactTop5Sql,
    "q66a_pq_exhaustive" -> exactTop5Sql,
    "q67a_ivfpq_exhaustive" -> exactTop5Sql,
    "q91a_pca_exhaustive" -> exactTop5Sql,
    // the truth-set size is exact SQL; the recall floors are the spec's
    // quantitative assertions re-stated as integers the gate can hash
    "q51a_lsh_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 5) AS sim
           FROM q JOIN e ON e.vec_id <> q.query_id),
         topk AS (
           SELECT query_id FROM scored
           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5)
         SELECT count(*) AS n_truth, CAST(1 AS INT) AS recall30_ok,
           CAST(1 AS INT) AS recall90_ok
         FROM topk""",
    "q95a_diversity_audit" ->
      """SELECT CAST(40 AS BIGINT) AS n_rows, CAST(40 AS BIGINT) AS n_distinct_ids,
         CAST(40 AS BIGINT) AS n_in_corpus, CAST(8 AS BIGINT) AS n_clusters,
         CAST(5 AS BIGINT) AS min_draws, CAST(5 AS BIGINT) AS max_draws""",
    "q52a_distinct_exact" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         CAST(1 AS INT) AS parts_within_15pct,
         CAST(1 AS INT) AS orders_within_15pct
         FROM lineitem GROUP BY l_returnflag""",
    "q114_contrastive_pairs" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 5) AS sim
           FROM q JOIN e ON e.vec_id <> q.query_id),
         pos AS (
           SELECT query_id, neighbor_id, sim, CAST(1 AS INT) AS rank
           FROM (SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
             FROM scored)
           WHERE rn = 1 AND sim >= 0.30),
         neg AS (
           SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
           FROM scored
           WHERE sim >= 0.05 AND sim < 0.30
             AND query_id IN (SELECT query_id FROM pos)
           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 4)
         SELECT query_id AS anchor_id, neighbor_id AS pair_id, 'pos' AS role, sim, rank FROM pos
         UNION ALL
         SELECT query_id AS anchor_id, neighbor_id AS pair_id, 'neg' AS role, sim, rank FROM neg""",
    "q108_knn_graph" ->
      s"""WITH $knnEdges3Cte
         SELECT query_id, neighbor_id, sim_micro,
           CAST(rnk AS INT) AS rank
         FROM knn""",
    "q221_ivf_knn_graph" ->
      s"""WITH $ivfKnn3Cte
         SELECT query_id, neighbor_id, sim_micro,
           CAST(rnk AS INT) AS rank
         FROM knn""",
    "q109_hard_negatives" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 5) AS sim
           FROM q JOIN e ON e.vec_id <> q.query_id
         )
         SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM scored
         WHERE sim >= 0.10 AND sim < 0.45
         QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 10""",
    // the lexical arm is the SAME Okapi CTE chain the BM25 gates pin
    // (TextQueries.bm25CtesSql) — composed, not copied, so a scoring
    // change cannot drift the hybrid gate from the arm it fuses
    "q97_hybrid_search" ->
      s"""WITH ${TextQueries.bm25CtesSql},
         lexall AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro
                    FROM c GROUP BY doc_id),
         lex AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank_lex
                 FROM lexall ORDER BY score_micro DESC, doc_id LIMIT 20),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         sem AS (SELECT vec_id AS doc_id,
                   CAST(row_number() OVER (
                     ORDER BY round(list_cosine_similarity(qv, v), 5) DESC, vec_id) AS INT) AS rank_sem
                 FROM e CROSS JOIN q WHERE vec_id <> 0
                 ORDER BY round(list_cosine_similarity(qv, v), 5) DESC, vec_id LIMIT 20),
         fused AS (
           SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex.rank_lex, sem.rank_sem,
             COALESCE(CAST(round(1000000.0 / (60 + lex.rank_lex)) AS BIGINT), 0) +
             COALESCE(CAST(round(1000000.0 / (60 + sem.rank_sem)) AS BIGINT), 0) AS rrf_micro
           FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         SELECT doc_id, rank_lex, rank_sem, rrf_micro FROM fused
         ORDER BY rrf_micro DESC, doc_id LIMIT 10""",
    "q57_embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         sc AS (
           SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM e
         )
         SELECT vec_id, CAST(len(v) AS INT) AS n_dims, scale,
           CASE WHEN scale = 0 THEN 0
                ELSE CAST(list_sum(list_transform(v,
                  x -> CAST(round(x / scale) AS BIGINT))) AS BIGINT) END AS q_sum,
           CASE WHEN scale = 0 THEN 0.0
                ELSE list_max(list_transform(v,
                  x -> abs(x - CAST(round(x / scale) AS BIGINT) * scale))) END AS max_err
         FROM sc""",
    "q50_ann_brute" -> exactTop5Sql)
}
