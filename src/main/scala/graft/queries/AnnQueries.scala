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
    "q108_knn_graph" -> q108KnnGraph,
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
  private[queries] val knnEdges3Cte: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       scored AS (
         SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(round(list_cosine_similarity(a.v, b.v) * 100000) AS BIGINT) AS sim_micro
         FROM e a JOIN e b ON a.vec_id <> b.vec_id
       ),
       knn AS MATERIALIZED (
         SELECT query_id, neighbor_id, sim_micro,
           row_number() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) AS rnk
         FROM scored
         QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) <= 3
       )"""

  // q51/q52 are approximate → rows-only checks (no oracle entries).
  val oracles: Map[String, String] = Map(
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
    "q50_ann_brute" ->
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
         QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5""")
}
