package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense-vector Catalyst expressions for the similarity-search surface.
  *
  * The round-1 implementation composed `zip_with` + `aggregate` built-ins;
  * higher-order functions evaluate their lambdas interpreted and allocate an
  * intermediate array per call, which at 12.5M candidate pairs (sf0.1
  * embedding near-dup) dominated the bench (~71 s). These expressions do the
  * same math in one tight primitive loop per row, and [[DotProductD]]
  * participates in codegen so the nested-loop join condition it feeds stays
  * compiled.
  */

/** Dot product of two array<double> columns (unit vectors from
  * [[UnitVector]]) → double. Null if either side is null; asymmetric
  * lengths take the shorter (never happens on fixed-dim embeddings). */
case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_d requires (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductD =
    copy(left = l, right = r)
}

/** L2-normalize an array<float|double> into a unit array<double>; an
  * all-zero vector normalizes to all-zero (cosine 0 against everything,
  * matching DuckDB's list_cosine_similarity NULL→filtered behavior is not
  * needed — the synthetic embeddings are never zero). Computed once per
  * corpus row so every downstream pair costs only [[DotProductD]]. */
case class UnitVector(child: Expression) extends UnaryExpression with CodegenFallback {

  @transient private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unit_vec requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_vec"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    var ss = 0.0
    while (i < n) {
      val v = if (fromFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = v
      ss += v * v
      i += 1
    }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}

/** Signed random-hyperplane sketch (LSH for cosine): bit b of the result =
  * sign of the projection of `vec` onto pseudo-random hyperplane b, whose
  * per-dimension signs derive from `byteswap64(seed ^ (b<<32) ^ d)` — the
  * exact formula of the round-1 column composition, kept so LSH bucketing
  * is reproducible, but evaluated in one loop instead of nBits×dim column
  * expressions. */
case class HyperplaneSketch64(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(nBits >= 1 && nBits <= 64, "nBits in [1,64]")

  @transient private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sketch"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var sketch = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var d = 0
      val bKey = seed ^ (b.toLong << 32)
      while (d < dim) {
        val v = if (fromFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        val sign = if (scala.util.hashing.byteswap64(bKey ^ d) < 0) -v else v
        proj += sign
        d += 1
      }
      if (proj >= 0) sketch |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sketch)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch64 =
    copy(child = newChild)
}

/** Indices of the `topN` centroids nearest (max dot product) to a unit
  * array<double> vector, ordered by (dot desc, index asc) — the IVF coarse
  * quantizer's assign/probe step as ONE argmax-over-broadcast-centroids
  * pass: no corpus×nlist row explosion, no per-row window sort (the
  * round-2 single-partition WindowExec hazard). The centroid matrix rides
  * inside the expression to the executors (nlist × dim doubles — the
  * trained model, tiny next to any corpus partition). */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], topN: Int,
    l2: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "centroids must be non-empty")
  require(topN >= 1 && topN <= centroids.length, "topN in [1, nlist]")
  private val centroidDim = centroids(0).length
  require(centroids.forall(_.length == centroidDim), "ragged centroid matrix")
  ModelGuard.check("nearest_centroids matrix",
    centroids.length.toLong * centroidDim, "nlist (or the vector dim)")

  // With `l2`, score = v·c − ||c||²/2, whose argmax is argmin ||v−c||²
  // (the ||v||² term is constant per row). Needed when centroids are NOT
  // unit-norm — e.g. PQ codebooks, whose update step is an L2 mean: a
  // plain max-dot assign would optimize a different objective than the
  // update and bias assignment toward large-norm centroids.
  @transient private lazy val halfSqNorms: Array[Double] =
    if (l2) centroids.map(c => 0.5 * c.map(x => x * x).sum)
    else new Array[Double](centroids.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    // A silently-truncated dot product would hand every drifted row a
    // plausible-looking bucket (near-zero recall, no error anywhere) —
    // dimension mismatch is data corruption and must surface.
    if (dim != centroidDim) throw new IllegalStateException(
      s"nearest_centroids: vector dim $dim != trained centroid dim $centroidDim")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getDouble(i); i += 1 }
    val n = centroids.length
    if (topN == 1) {
      var bestIdx = 0
      var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        val cent = centroids(c)
        var s = -halfSqNorms(c)
        var j = 0
        while (j < dim) { s += v(j) * cent(j); j += 1 }
        if (s > bestDot) { bestDot = s; bestIdx = c }
        c += 1
      }
      new GenericArrayData(Array(bestIdx))
    } else {
      val scores = new Array[Double](n)
      var c = 0
      while (c < n) {
        val cent = centroids(c)
        var s = -halfSqNorms(c)
        var j = 0
        while (j < dim) { s += v(j) * cent(j); j += 1 }
        scores(c) = s
        c += 1
      }
      val idx = Array.range(0, n).sortBy(i0 => (-scores(i0), i0)).take(topN)
      new GenericArrayData(idx)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** The EXACT-integer coarse quantizer behind
  * [[graft.operators.Similarity.ivfKnnGraph]]: the `topN` cell ids whose
  * integer centroids minimize the squared L2 distance to an array<long>
  * micro-quantized vector, ordered by (score asc, cell id asc) with
  * score = Σ_d c_d·(c_d − 2·v_d) — the ||v||²-free form of ||v−c||²,
  * whose argmin is the same (the per-row ||v||² term is constant). All
  * arithmetic is Long (|score| ≤ 3·dim·maxCoord² ≈ 6.4e13 at dim 64 /
  * 1e6-quantized unit-range coords — far inside Long), so a DuckDB
  * oracle replaying the same products over the same quantized vectors
  * reproduces every assignment and probe list bit-for-bit — unlike
  * [[NearestCentroids]], whose double dots are partition-order-safe but
  * not cross-engine-replayable. Ties (identical centroids from clone
  *-degenerate corpora) break on the smaller cell id, a strict total
  * order either engine can state as `ORDER BY score, cell`. */
case class NearestCellsExact(child: Expression, cells: Array[Int],
    centroids: Array[Array[Long]], topN: Int)
    extends UnaryExpression with CodegenFallback {

  require(cells.nonEmpty && cells.length == centroids.length,
    "cells and centroids must align and be non-empty")
  require(cells.zip(cells.tail).forall { case (a, b) => a < b },
    "cells must be strictly ascending (the stable score sort breaks ties on position)")
  require(topN >= 1 && topN <= cells.length, "topN in [1, nCells]")
  private val centroidDim = centroids(0).length
  require(centroids.forall(_.length == centroidDim), "ragged centroid matrix")
  ModelGuard.check("nearest_cells_exact matrix",
    centroids.length.toLong * centroidDim, "kCells (or the vector dim)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_exact requires array<long>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells_exact"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (dim != centroidDim) throw new IllegalStateException(
      s"nearest_cells_exact: vector dim $dim != centroid dim $centroidDim")
    val v = new Array[Long](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getLong(i); i += 1 }
    val n = cells.length
    val scores = new Array[Long](n)
    var c = 0
    while (c < n) {
      val cent = centroids(c)
      var s = 0L
      var j = 0
      while (j < dim) { val cd = cent(j); s += cd * (cd - 2L * v(j)); j += 1 }
      scores(c) = s
      c += 1
    }
    // cells[] is sorted ascending by construction, so a stable sort on
    // score alone breaks ties on the smaller cell id.
    val idx = Array.range(0, n).sortBy(scores(_)).take(topN)
    new GenericArrayData(idx.map(cells(_)))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExact =
    copy(child = newChild)
}

/** Guard rail for trained models that ride query plans as literals /
  * expression state (IVF centroids, PQ codebooks): they are broadcast
  * with EVERY serialized task, so they must stay broadcast-sized, not
  * data-sized. At production dims the knobs can silently ask for
  * hundreds of MB (nlist=65k × dim=768 ≈ 400 MB) — fail at train time
  * with the knobs to turn, not at job-submit time with an opaque
  * serialization error. */
object ModelGuard {
  /** Documented ceiling: 128 MiB of model doubles — ~2× the default
    * broadcast-join threshold the engine runs with, far above any sane
    * coarse-quantizer/codebook and far below task-serialization pain. */
  val MaxModelBytes: Long = 128L << 20

  def check(what: String, values: Long, knobs: String): Unit = {
    val bytes = values * 8L
    require(bytes <= MaxModelBytes,
      f"$what is ${bytes / (1 << 20)} MiB of doubles, above the " +
        f"${MaxModelBytes / (1 << 20)} MiB plan-literal ceiling - models ride every " +
        f"serialized task; reduce $knobs (or shard the index) instead of raising the ceiling")
  }
}

object VectorExprs {
  def dotD(a: Column, b: Column): Column =
    Cols.column(DotProductD(Cols.expression(a), Cols.expression(b)))
  def unitVec(v: Column): Column =
    Cols.column(UnitVector(Cols.expression(v)))
  def hyperplaneSketch(v: Column, nBits: Int, seed: Long = 42L): Column =
    Cols.column(HyperplaneSketch64(Cols.expression(v), nBits, seed))
  def nearestCentroids(v: Column, centroids: Array[Array[Double]], topN: Int): Column =
    Cols.column(NearestCentroids(Cols.expression(v), centroids, topN))

  /** Nearest centroids by MINIMUM L2 distance (argmax of v·c − ||c||²/2)
    * — for non-unit centroids such as PQ codebooks, where Lloyd's update
    * is an L2 mean and assignment must optimize the same objective. */
  def nearestCentroidsL2(v: Column, centroids: Array[Array[Double]], topN: Int): Column =
    Cols.column(NearestCentroids(Cols.expression(v), centroids, topN, l2 = true))

  /** Top-`topN` cell ids by exact-integer squared-L2 to the aligned
    * (cells, centroids) matrix — see [[NearestCellsExact]]. */
  def nearestCellsExact(v: Column, cells: Array[Int], centroids: Array[Array[Long]],
      topN: Int): Column =
    Cols.column(NearestCellsExact(Cols.expression(v), cells, centroids, topN))
}
