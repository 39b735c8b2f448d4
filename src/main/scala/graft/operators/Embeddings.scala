package graft.operators

import graft.catalyst.VectorExprs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Embedding-column utilities beyond similarity search — the storage /
  * shipping side of a training-data pipeline.
  */
object Embeddings {

  /** Product-quantization codebooks: `m` subspaces × (≤`k`) centroids ×
    * `dim/m` doubles. The model a 100-TB ANN index stores ONCE while every
    * corpus vector shrinks to `m` small codes (e.g. 64-dim float32 →
    * 8 bytes: 32× smaller). */
  type PqCodebooks = Array[Array[Array[Double]]]

  /** Train PQ codebooks over the (L2-normalized) corpus: per subspace, a
    * deterministic hash-bucket seeding (same shape as the IVF coarse
    * quantizer — min_by representative per id-hash bucket, one map-side
    * agg) followed by `iters` Lloyd rounds (assign = argmin ||v−c||² as one
    * norm-corrected argmax pass — subvector slices are NOT unit-norm, so
    * assignment must share the L2 objective of the mean update;
    * update = element-position mean via posexplode + groupBy — all
    * distributed; only the k×dim/m centroid table is ever collected, a
    * model fetch). Deterministic for fixed data: no random init, and every
    * aggregation is over disjoint keys. Empty cells keep their previous
    * centroid (standard Lloyd degenerate-cell handling). */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 2): PqCodebooks = {
    require(m >= 1 && k >= 2 && iters >= 0)
    val unit = emb.select(col(idCol).as("_id"), VectorExprs.unitVec(col(vecCol)).as("_v"))
    val dim = unit.select(size(col("_v"))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // all m subspaces travel through ONE plan per training phase (a
    // subspace column next to the sliced subvector), so each phase is a
    // single distributed job + one ≤ m×k×(dim/m)-value collect — not
    // m separate job chains (24 serial driver round-trips at m=8,
    // iters=2; this shape does 3).
    val sv = unit.select(col("_id"),
      posexplode(array((0 until m).map(s => slice(col("_v"), s * sub + 1, sub)): _*))
        .as(Seq("_s", "_sv")))
    def toBooks(rows: Array[org.apache.spark.sql.Row]): Map[(Int, Int), Array[Double]] =
      rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    val init = toBooks(sv
      .groupBy(col("_s"), pmod(xxhash64(col("_id")), lit(k)).cast("int").as("_cb"))
      .agg(min_by(col("_sv"), col("_id")).as("_c"))
      .collect())
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      (0 until k).flatMap(c => init.get((s, c))).toArray
    }
    for (_ <- 0 until iters) {
      // per-subspace assignment needs that subspace's centroids: union of
      // m filtered branches, each with its own codebook literal — still
      // ONE job at collect time
      val assigned = (0 until m).map { s =>
        sv.filter(col("_s") === s)
          .withColumn("_code",
            VectorExprs.nearestCentroidsL2(col("_sv"), books(s), 1).getItem(0))
      }.reduce(_ unionByName _)
      val updated = assigned
        .select(col("_s"), col("_code"), posexplode(col("_sv")).as(Seq("_pos", "_x")))
        .groupBy("_s", "_code", "_pos").agg(avg(col("_x")).as("_mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
      books = Array.tabulate(m)(s =>
        books(s).indices.map(c => updated.getOrElse((s, c), books(s)(c))).toArray)
    }
    books
  }

  /** Encode each (normalized) vector as `m` centroid codes — one argmax
    * expression per subspace, pure projection, no shuffle. */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      codebooks: PqCodebooks): DataFrame = {
    val sub = codebooks(0)(0).length
    val unit = VectorExprs.unitVec(col(vecCol))
    val codes = array(codebooks.indices.map(s =>
      VectorExprs.nearestCentroidsL2(slice(unit, s * sub + 1, sub), codebooks(s), 1).getItem(0)): _*)
    emb.select(col(idCol), codes.as("codes"))
  }

  /** Reconstruct the approximate vector from PQ codes: concatenate the
    * per-subspace centroids (codebooks ride as a literal — the model is
    * broadcast with the plan, never joined). */
  private def pqDecode(codesCol: Column, codebooks: PqCodebooks): Column =
    concat(codebooks.indices.map(s =>
      element_at(typedLit(codebooks(s).map(_.toSeq).toSeq), codesCol.getItem(s) + 1)): _*)

  /** Mean squared L2 reconstruction error E‖v − decode(encode(v))‖² over
    * the (normalized) corpus — THE objective Lloyd training minimizes.
    * Each full round (L2 assign + per-cell mean update, empty cells
    * frozen) is non-increasing in this by construction, so the spec pins
    * `error(iters=n) ≤ error(iters=0)` as a law — unlike recall@k, which
    * is a downstream proxy the objective does not promise monotonically
    * (and on near-uniform synthetic embeddings, measurably isn't). */
  def pqReconstructionError(emb: DataFrame, idCol: String, vecCol: String,
      codebooks: PqCodebooks): Double = {
    val sub = codebooks(0)(0).length
    val unit = VectorExprs.unitVec(col(vecCol))
    val codes = array(codebooks.indices.map(s =>
      VectorExprs.nearestCentroidsL2(slice(unit, s * sub + 1, sub), codebooks(s), 1)
        .getItem(0)): _*)
    emb.select(unit.as("_v"), pqDecode(codes, codebooks).as("_a"))
      .select(avg(aggregate(
        zip_with(col("_v"), col("_a"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, e) => acc + e)).as("_mse"))
      .head().getDouble(0)
  }

  /** Approximate cosine top-k over PQ codes (asymmetric distance: exact
    * query dotted with the reconstructed corpus vector — equivalent to the
    * classic per-subspace ADC lookup-table sum, expressed as one codegen
    * dot). At scale the corpus side stores ONLY the codes; the decode is
    * a per-row projection off the broadcast codebook literal. Recall < 1
    * by design; measured against [[Similarity.bruteForceTopK]] in the
    * spec. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, codebooks: PqCodebooks): DataFrame = {
    val codes = pqEncode(corpus, idCol, vecCol, codebooks)
      .select(col(idCol).as("neighbor_id"), pqDecode(col("codes"), codebooks).as("_cv"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv")))
    val scored = codes.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(VectorExprs.dotD(col("_qv"), col("_cv")), 5))
    Similarity.topKBySim(scored, k)
  }

  /** Two-stage PQ search — the production shape (compressed scan, then
    * refine): stage 1 ranks the WHOLE corpus with [[pqTopK]]'s compressed
    * scorer and keeps a shortlist of `shortlist` candidates per query;
    * stage 2 re-attaches full vectors for the shortlist ONLY and ranks
    * exactly. At 100 TB the full-vector store is touched for
    * queries×shortlist rows instead of the whole corpus, while the scan
    * reads 32×-compressed codes. Recall is governed by shortlist depth
    * (stage 2 is exact on it) — measured vs brute force in the spec. */
  def pqTopKRerank(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, shortlist: Int, codebooks: PqCodebooks): DataFrame = {
    require(shortlist >= k, "shortlist >= k")
    val cand = pqTopK(corpus, queries, idCol, vecCol, shortlist, codebooks)
      .select(col("query_id"), col("neighbor_id"))
    val full = corpus.select(col(idCol).as("neighbor_id"), VectorExprs.unitVec(col(vecCol)).as("_cv"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv")))
    val exact = cand.join(full, Seq("neighbor_id")).join(q, Seq("query_id"))
      .withColumn("sim", round(VectorExprs.dotD(col("_qv"), col("_cv")), 5))
    Similarity.topKBySim(exact, k)
  }

  /** Symmetric per-vector int8 quantization: `scale = max|v| / 127`,
    * `code_i = round(v_i / scale)` — the standard embedding-compression
    * step before shipping vectors to an ANN index or training job (4-8×
    * smaller than float32, reconstruction `code_i * scale`).
    *
    * Per-row, linear, no shuffle: quantization is a projection and scales
    * embarrassingly. Every emitted column is IEEE-deterministic arithmetic
    * on exact inputs (no rounding ties: `scale` is one double division,
    * `max_err` a max over identical double ops), so the whole output is
    * hash-checkable cross-engine — gate q57 replays it in DuckDB list
    * algebra. `q_sum` is the integer checksum of all codes: it pins every
    * individual code without shipping the code arrays through the oracle
    * compare. By construction |v_i|/scale <= 127, so codes need no clamp.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    def codeOf(x: Column): Column = round(x / col("_scale")).cast("long")
    emb
      .select(col(idCol), v.as("_v"))
      .withColumn("_scale", array_max(transform(col("_v"), x => abs(x))) / lit(127.0))
      .select(
        col(idCol),
        size(col("_v")).as("n_dims"),
        col("_scale").as("scale"),
        when(col("_scale") === 0, lit(0L))
          .otherwise(aggregate(transform(col("_v"), x => codeOf(x)), lit(0L), (acc, q) => acc + q))
          .as("q_sum"),
        when(col("_scale") === 0, lit(0.0))
          .otherwise(array_max(transform(col("_v"),
            x => abs(x - codeOf(x).cast("double") * col("_scale")))))
          .as("max_err"))
  }
}
