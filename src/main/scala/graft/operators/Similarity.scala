package graft.operators

import graft.catalyst.VectorExprs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}

/** Similarity search over an embedding column (`array<float>`) — the
  * ANN surface of the LLM-data-pipeline (BASELINE.json north star).
  *
  * Vectors are L2-normalized ONCE per row (`unit_vec`), so every pair
  * evaluation is a single codegen'd dot product (`dot_d`) — no per-pair
  * norms, no intermediate arrays. Ranking anywhere in this module is over
  * `(round(cosine, 5) DESC, id ASC)` — a strict total order on
  * deterministic values, so top-k sets are stable across engines and runs.
  */
object Similarity {

  private def cosineOfUnits(qv: String, cv: String) =
    round(VectorExprs.dotD(col(qv), col(cv)), 5)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self-match excluded).
    *
    * The query side is broadcast (queries ≪ corpus is the ANN contract), so
    * the corpus is scanned exactly once with NO shuffle of the corpus side;
    * the only shuffle is the per-query top-k aggregation.
    * This is the exact baseline the LSH path is measured against.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), VectorExprs.unitVec(col(vecCol)).as("_cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineOfUnits("_qv", "_cv"))
    topKBySim(scored, k)
  }

  /** LSH-bucketed approximate top-k (the 100-TB scale path): corpus and
    * queries are sketched with `nBits` signed random hyperplanes
    * (deterministic, seeded; sketch sign is scale-invariant so unit vectors
    * sketch identically to raw ones); candidates = corpus vectors agreeing
    * with the query on at least one of the `bands` sketch bands; exact
    * cosine + top-k on candidates only. Recall < 1 by design; measured
    * against [[bruteForceTopK]] in the spec.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nBits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val bandBits = nBits / bands
    val mask = (1L << bandBits) - 1L
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.withColumn("_sk", VectorExprs.hyperplaneSketch(col(vec), nBits))
        .select(col(id), col(vec),
          posexplode(array((0 until bands).map(bnd =>
            shiftrightunsigned(col("_sk"), bnd * bandBits).bitwiseAND(lit(mask))): _*))
            .as(Seq("_band", "_bv")))
    val q = banded(
      queries.select(col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv")),
      "query_id", "_qv")
    val c = banded(
      corpus.select(col(idCol).as("neighbor_id"), VectorExprs.unitVec(col(vecCol)).as("_cv")),
      "neighbor_id", "_cv")
    val cand = c.join(broadcast(q), Seq("_band", "_bv"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", cosineOfUnits("_qv", "_cv"))
    topKBySim(cand, k)
  }

  /** IVF-style ANN (inverted-file index): coarse-quantize the corpus into
    * `nlist` buckets by nearest centroid; each query probes its `nprobe`
    * nearest centroids and scores ONLY those buckets.
    *
    * Centroids are picked deterministically by striding the corpus in id
    * order (a k-means|| seeding stand-in — the bucketing plan, not the
    * centroid quality, is what changes at scale). Distributed shape: the
    * corpus is scanned once against broadcast centroids and lands
    * partitioned by bucket; probing shuffles only (query, bucket) pairs,
    * so query cost tracks corpus/nlist × nprobe — the IVF contract.
    * Recall < 1 by design; measured against [[bruteForceTopK]] in the
    * spec. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    require(nprobe <= nlist, "nprobe <= nlist")
    val c = corpus.select(col(idCol).as("neighbor_id"), VectorExprs.unitVec(col(vecCol)).as("_cv"))
    val n = c.count()
    val stride = math.max(1L, n / nlist)
    val centroids = broadcast(
      c.withColumn("_rn", row_number().over(Window.orderBy(col("neighbor_id"))))
        .filter((col("_rn") - 1) % stride === 0)
        .limit(nlist)
        .select(col("_rn").as("_centroid_id"), col("_cv").as("_centroid")))
    // corpus side: every vector assigned to its single nearest centroid
    val assigned = c.join(centroids)
      .withColumn("_cdist", VectorExprs.dotD(col("_cv"), col("_centroid")))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("neighbor_id")).orderBy(col("_cdist").desc, col("_centroid_id"))))
      .filter(col("_r") === 1)
      .select(col("_centroid_id").as("_bucket"), col("neighbor_id"), col("_cv"))
    // query side: nprobe nearest centroids each
    val q = queries.select(col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv"))
    val probes = q.join(centroids)
      .withColumn("_cdist", VectorExprs.dotD(col("_qv"), col("_centroid")))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_cdist").desc, col("_centroid_id"))))
      .filter(col("_r") <= nprobe)
      .select(col("_centroid_id").as("_bucket"), col("query_id"), col("_qv"))
    val cand = assigned.join(broadcast(probes), Seq("_bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineOfUnits("_qv", "_cv"))
    topKBySim(cand, k)
  }

  /** Embedding near-duplicate pairs: all (idA < idB) pairs with rounded
    * cosine >= minSim. All-pairs via a nested-loop self-join over unit
    * vectors — exact semantics for the dedup verify gate (the LSH path
    * above is the approximate scale-out; at 100 TB this operator runs on
    * LSH-blocked candidates instead of the full cross product). */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      minSim: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), VectorExprs.unitVec(col(vecCol)).as("_va"))
    val b = emb.select(col(idCol).as("id_b"), VectorExprs.unitVec(col(vecCol)).as("_vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosineOfUnits("_va", "_vb"))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }

  private def topKBySim(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
}
