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
      m: Int, k: Int, iters: Int = 2, normalize: Boolean = true): PqCodebooks = {
    require(m >= 1 && k >= 2 && iters >= 0)
    val unit = emb.select(col(idCol).as("_id"), prep(vecCol, normalize).as("_v"))
    val dim = unit.select(size(col("_v"))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // the full codebook set (m × k × dim/m = k × dim doubles) rides query
    // plans as one literal — fail here with the knobs, not at job submit
    graft.catalyst.ModelGuard.check("PQ codebook model",
      k.toLong * dim, "k (centroids per subspace)")
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

  /** `vecCol` as the array<double> the codebooks were trained on: unit-
    * normalized for whole-vector PQ, raw for residual coding (residuals
    * must NOT be re-normalized — their magnitude IS the signal the
    * coarse quantizer left behind). */
  private def prep(vecCol: String, normalize: Boolean) =
    if (normalize) VectorExprs.unitVec(col(vecCol)) else col(vecCol).cast("array<double>")

  /** The `m` per-subspace nearest-centroid codes of one vector column —
    * min-L2 argmax passes over the codebook literals, pure projection. */
  private def codesOf(vec: Column, codebooks: PqCodebooks): Column = {
    val sub = codebooks(0)(0).length
    array(codebooks.indices.map(s =>
      VectorExprs.nearestCentroidsL2(slice(vec, s * sub + 1, sub), codebooks(s), 1).getItem(0)): _*)
  }

  /** Encode each (normalized) vector as `m` centroid codes — one argmax
    * expression per subspace, pure projection, no shuffle. */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      codebooks: PqCodebooks, normalize: Boolean = true): DataFrame =
    emb.select(col(idCol), codesOf(prep(vecCol, normalize), codebooks).as("codes"))

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
    val unit = VectorExprs.unitVec(col(vecCol))
    meanSqError(emb.select(unit.as("_v"),
      pqDecode(codesOf(unit, codebooks), codebooks).as("_a")))
  }

  /** avg ‖_v − _a‖² of a two-array-column frame. */
  private def meanSqError(frame: DataFrame): Double =
    frame.select(avg(aggregate(
        zip_with(col("_v"), col("_a"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, e) => acc + e)).as("_mse"))
      .head().getDouble(0)

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
    rerankExact(pqTopK(corpus, queries, idCol, vecCol, shortlist, codebooks),
      corpus, queries, idCol, vecCol, k)
  }

  /** Stage 2 of any two-stage search: re-attach full vectors for the
    * (query_id, neighbor_id) shortlist ONLY and rank exactly — the
    * full-vector store is touched for queries×shortlist rows. */
  private def rerankExact(cand: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val full = corpus.select(col(idCol).as("neighbor_id"), VectorExprs.unitVec(col(vecCol)).as("_cv"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv")))
    val exact = cand.select(col("query_id"), col("neighbor_id"))
      .join(full, Seq("neighbor_id")).join(q, Seq("query_id"))
      .withColumn("sim", round(VectorExprs.dotD(col("_qv"), col("_cv")), 5))
    Similarity.topKBySim(exact, k)
  }

  // ------------------------------------------------------------------
  // IVF-PQ: the composed index shape a 100-TB ANN deployment actually
  // runs — coarse-quantize (the IVF inverted file bounds how much of the
  // corpus a query touches), PQ-encode the RESIDUAL v − c(v) per list
  // (residuals have less variance than raw vectors, so the same (m, k)
  // budget quantizes them more finely), probe = compressed-scan the codes
  // of nprobe lists, then exact-rerank the shortlist.
  // ------------------------------------------------------------------

  /** The IVF-PQ model: ≤`nlist` k-means coarse centroids + PQ codebooks
    * trained on coarse residuals. Unlike [[Similarity.ivfTopK]]'s
    * representative-based quantizer (which only partitions the corpus, so
    * any deterministic representative works), IVF-PQ's coarse centroids
    * must MINIMIZE residual variance — a random unit representative
    * leaves ‖v − c‖ ≈ √2 on spread-out data, residuals with MORE
    * variance than the raw vectors, and residual coding then loses to
    * plain PQ (measured: MSE 0.76 vs 0.46 on the gate corpus). Bucket
    * MEANS guarantee E‖v−c(v)‖² = 1 − Σ nᵦ‖c̄ᵦ‖²/N < E‖v‖² already at
    * init, and every Lloyd round is non-increasing. */
  final case class IvfPqModel(coarse: Array[Array[Double]], books: PqCodebooks)

  /** k-means coarse quantizer: init = per-id-hash-bucket mean, then
    * `iters` Lloyd rounds (L2 assign as one norm-corrected argmax pass;
    * mean update via posexplode + groupBy). One distributed job + one
    * ≤nlist×dim collect per round — model fetches only. Cells emptied by
    * a round drop out (indices recompact; bucket ids are only ever
    * defined as positions in the CURRENT centroid array). */
  private def coarseTrain(c: DataFrame, nlist: Int, iters: Int): Array[Array[Double]] = {
    def meansOf(assigned: DataFrame): Array[Array[Double]] =
      assigned.select(col("_bucket"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy("_bucket", "_pos").agg(avg(col("_x")).as("_m"))
        .collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
        .toArray
    var cent = meansOf(c.withColumn("_bucket",
      pmod(xxhash64(col("_id")), lit(nlist)).cast("int")))
    for (_ <- 0 until iters) cent = meansOf(c.withColumn("_bucket",
      VectorExprs.nearestCentroidsL2(col("_v"), cent, 1).getItem(0)))
    cent
  }

  /** v − coarse(bucket): the residual the PQ codes. The coarse matrix
    * rides as one literal; the subtraction is a per-row projection. */
  private def residualOf(vec: Column, bucket: Column,
      coarse: Array[Array[Double]]): Column =
    zip_with(vec, element_at(typedLit(coarse.map(_.toSeq).toSeq), bucket + 1),
      (a, b) => a - b)

  /** Train: k-means coarse quantizer ([[coarseTrain]], `iters` Lloyd
    * rounds) + [[pqTrain]] over the residual frame — one distributed job
    * per phase, model-sized collects only. */
  def ivfPqTrain(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, k: Int, iters: Int = 2): IvfPqModel = {
    val c = emb.select(col(idCol).as("_id"), VectorExprs.unitVec(col(vecCol)).as("_v"))
    val coarse = coarseTrain(c, nlist, iters)
    val resid = c
      .withColumn("_bucket", VectorExprs.nearestCentroidsL2(col("_v"), coarse, 1).getItem(0))
      .select(col("_id"), residualOf(col("_v"), col("_bucket"), coarse).as("_r"))
    IvfPqModel(coarse, pqTrain(resid, "_id", "_r", m, k, iters, normalize = false))
  }

  /** The stored index: (id, inverted-list bucket, m residual codes) —
    * what a 100-TB deployment persists instead of full vectors. Pure
    * projection, no shuffle. */
  def ivfPqEncode(emb: DataFrame, idCol: String, vecCol: String,
      model: IvfPqModel): DataFrame =
    emb.select(col(idCol), VectorExprs.unitVec(col(vecCol)).as("_v"))
      .withColumn("bucket", VectorExprs.nearestCentroidsL2(col("_v"), model.coarse, 1).getItem(0))
      .select(col(idCol), col("bucket"),
        codesOf(residualOf(col("_v"), col("bucket"), model.coarse), model.books).as("codes"))

  /** Compressed-scan candidates of the `nprobe` probed lists, scored
    * asymmetrically: sim ≈ q·c(bucket) + q·decode(codes) (dot is linear,
    * so the coarse term is computed ONCE per (query, bucket) on the
    * broadcast probe side — nq×nprobe rows — and only the residual dot
    * runs per candidate). Probe cost tracks corpus/nlist × nprobe. */
  def ivfPqCandidates(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, model: IvfPqModel): DataFrame = {
    val coarseLit = typedLit(model.coarse.map(_.toSeq).toSeq)
    val index = ivfPqEncode(corpus, idCol, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("bucket"),
        pqDecode(col("codes"), model.books).as("_rv"))
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), VectorExprs.unitVec(col(vecCol)).as("_qv"))
        .withColumn("bucket", explode(VectorExprs.nearestCentroidsL2(
          col("_qv"), model.coarse, math.min(nprobe, model.coarse.length))))
        .withColumn("_csim", VectorExprs.dotD(col("_qv"), element_at(coarseLit, col("bucket") + 1))))
    index.join(probes, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(col("_csim") + VectorExprs.dotD(col("_qv"), col("_rv")), 5))
  }

  /** One-stage IVF-PQ top-k (compressed scan only). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, model: IvfPqModel): DataFrame =
    Similarity.topKBySim(
      ivfPqCandidates(corpus, queries, idCol, vecCol, nprobe, model), k)

  /** Two-stage IVF-PQ: compressed scan of nprobe lists → shortlist →
    * exact rerank. The production shape: the scan touches codes of
    * nprobe/nlist of the corpus, the full-vector store only
    * queries×shortlist rows. */
  def ivfPqTopKRerank(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, shortlist: Int, model: IvfPqModel): DataFrame = {
    require(shortlist >= k, "shortlist >= k")
    rerankExact(ivfPqTopK(corpus, queries, idCol, vecCol, shortlist, nprobe, model),
      corpus, queries, idCol, vecCol, k)
  }

  /** Mean squared IVF-PQ reconstruction error
    * E‖v − (c(v) + decode(codes))‖² — comparable to
    * [[pqReconstructionError]] at equal (m, k): the residual family's
    * reason to exist is making this smaller. */
  def ivfPqReconstructionError(emb: DataFrame, idCol: String, vecCol: String,
      model: IvfPqModel): Double = {
    val enc = emb.select(col(idCol), VectorExprs.unitVec(col(vecCol)).as("_v"))
      .withColumn("_bucket", VectorExprs.nearestCentroidsL2(col("_v"), model.coarse, 1).getItem(0))
      .withColumn("_r", residualOf(col("_v"), col("_bucket"), model.coarse))
    meanSqError(enc.select(col("_v"),
      zip_with(element_at(typedLit(model.coarse.map(_.toSeq).toSeq), col("_bucket") + 1),
        pqDecode(codesOf(col("_r"), model.books), model.books),
        (a, b) => a + b).as("_a")))
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
  // ------------------------------------------------------------------
  // PCA: dimensionality reduction as an ANN accelerator — project the
  // corpus onto its top-kDims principal axes (the subspace carrying the
  // most variance), shortlist in the reduced space (kDims/d of the scan
  // arithmetic), then exact-rerank full vectors for the shortlist only.
  // The third compression family next to PQ (codes) and IVF (lists);
  // composable with both (reduce dims, THEN build the IVF-PQ index).
  // ------------------------------------------------------------------

  /** PCA model: the training mean and `kDims` orthonormal principal
    * axes (each length d). Rides query plans as literals — a model
    * fetch, ModelGuard-gated like the PQ codebooks. */
  final case class PcaModel(mean: Array[Double], axes: Array[Array[Double]])

  /** Train the top-`kDims` principal axes of the unit-normalized
    * corpus. One distributed mean aggregation + Spark ML's PCA (a
    * covariance aggregation and a d×d driver-side eigensolve — d is
    * model-sized, the corpus never leaves the cluster). Projection is
    * implemented HERE (mean-centered, codegen'd dot per axis) rather
    * than through PCAModel.transform, which does not mean-center. */
  def pcaTrain(emb: DataFrame, idCol: String, vecCol: String,
      kDims: Int): PcaModel = {
    require(kDims >= 1, "kDims >= 1")
    val unit = emb.select(VectorExprs.unitVec(col(vecCol)).as("_v"))
    val dim = unit.select(size(col("_v"))).head().getInt(0)
    require(kDims <= dim, s"kDims=$kDims must be <= dim=$dim")
    graft.catalyst.ModelGuard.check("PCA basis model",
      (kDims + 1).toLong * dim, "kDims (principal axes)")
    val mean = unit.select(posexplode(col("_v")).as(Seq("_i", "_x")))
      .groupBy("_i").agg(avg(col("_x")).as("_m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    // fit on the RAW unit vectors: PCA derives axes from the covariance
    // matrix, which is mean-centered by construction (shift-invariant) —
    // pre-centering here would be a redundant full-corpus projection.
    // The mean matters only on the projection side, where [[centeredOf]]
    // applies it (PCAModel.transform would not).
    val pc = new org.apache.spark.ml.feature.PCA()
      .setInputCol("_cv").setOutputCol("_p").setK(kDims)
      .fit(unit.select(org.apache.spark.ml.functions.array_to_vector(col("_v")).as("_cv")))
      .pc // d×kDims, column-major
    val axes = Array.tabulate(kDims)(j =>
      Array.tabulate(dim)(i => pc(i, j)))
    PcaModel(mean, axes)
  }

  /** Mean-centered vector, as the projection and error paths see it. */
  private def centeredOf(vecCol: String, model: PcaModel): Column =
    zip_with(VectorExprs.unitVec(col(vecCol)), typedLit(model.mean.toSeq),
      (a, b) => a - b)

  /** Project each vector onto the model's axes: `kDims` codegen'd dots
    * against axis literals — pure projection, no shuffle. */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame =
    emb.select(col(idCol),
      array(model.axes.map(ax =>
        VectorExprs.dotD(centeredOf(vecCol, model), typedLit(ax.toSeq))): _*).as("proj"))

  /** Mean squared reconstruction error of the rank-`kDims` model. With
    * orthonormal axes, ‖c − BBᵀc‖² = ‖c‖² − ‖Bᵀc‖² — two scalar dots,
    * no reconstruction materialized. Monotone non-increasing in kDims
    * (spec-pinned), 0 at kDims = d. */
  def pcaReconstructionError(emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): Double = {
    val c = centeredOf(vecCol, model)
    val p = array(model.axes.map(ax =>
      VectorExprs.dotD(c, typedLit(ax.toSeq))): _*)
    emb.select((VectorExprs.dotD(c, c) - VectorExprs.dotD(p, p)).as("_e"))
      .agg(avg(col("_e"))).head().getDouble(0)
  }

  /** Two-stage PCA search: shortlist by reduced-space dot (the scan does
    * kDims/d of the arithmetic and reads the compact projection), then
    * exact full-vector rerank for queries×shortlist rows only. Recall is
    * governed by how much variance the axes capture (measured in the
    * spec, the PQ convention). */
  def pcaTopKRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int, model: PcaModel): DataFrame = {
    require(shortlist >= k, "shortlist >= k")
    val proj = pcaProject(corpus, idCol, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("proj").as("_cv"))
    val q = broadcast(pcaProject(queries, idCol, vecCol, model)
      .select(col(idCol).as("query_id"), col("proj").as("_qv")))
    val scored = proj.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(VectorExprs.dotD(col("_qv"), col("_cv")), 5))
    rerankExact(Similarity.topKBySim(scored, shortlist),
      corpus, queries, idCol, vecCol, k)
  }

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

  /** Semantic-diversity sampling — uniform coverage of the embedding
    * space instead of frequency-weighted draws: k-means the corpus
    * ([[coarseTrain]] — hash-seeded init + Lloyd rounds, deterministic),
    * assign every row its cluster in one argmax pass, then keep
    * `perCluster` rows per cluster under the content-hash total order
    * ([[graft.operators.Relational.quotaSampleByHash]]). A 100-point
    * cluster and a 10-point cluster contribute the SAME sample mass, so
    * dominant modes of the corpus stop dominating the sample — the
    * cluster-balanced curation draw for training-data mixtures.
    *
    * Output: `(cluster, idCol)`. Shapes: training is one model fetch
    * per Lloyd round; assignment is a projection (centroid matrix rides
    * as a literal); the quota draw is the single-shuffle bounded-state
    * aggregation — nothing scales with corpus size except the one keyed
    * agg. */
  def diversitySample(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, perCluster: Int, iters: Int = 2): DataFrame = {
    require(nClusters >= 1 && perCluster >= 1, "nClusters, perCluster >= 1")
    val c = emb.select(col(idCol).as("_id"), VectorExprs.unitVec(col(vecCol)).as("_v"))
    val cent = coarseTrain(c, nClusters, iters)
    val assigned = c
      .withColumn("cluster", VectorExprs.nearestCentroidsL2(col("_v"), cent, 1).getItem(0))
      .select(col("cluster"), col("_id").as(idCol))
    Relational.quotaSampleByHash(assigned, "cluster", idCol, perCluster)
  }
}
