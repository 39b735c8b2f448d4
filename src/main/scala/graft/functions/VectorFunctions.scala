package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector scalar functions for similarity search over embedding
  * columns (`embeddings.embedding: array<float>`).
  *
  * All math is promoted to double and expressed with `zip_with`/`aggregate`
  * built-ins: sequential left-fold over the array gives a deterministic
  * summation order (unlike a parallel reduction), which the DuckDB oracle
  * reproduces with ordered list aggregation. No UDF — stays codegen-friendly
  * and null-safe.
  */
object VectorFunctions {

  /** Dot product of two equal-length numeric arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine rounded to `scale` decimals — the exported, cross-engine-stable
    * form (last-ulp differences in the two engines' fold order vanish under
    * rounding; ranking MUST use the rounded value plus an id tiebreak). */
  def cosineRounded(a: Column, b: Column, scale: Int = 5): Column =
    round(cosine(a, b), scale)

  /** Signed random-hyperplane sketch (SimHash-for-vectors) — `nBits` sign
    * bits from pseudo-random hyperplanes derived deterministically from the
    * bit index via a hash of the dimension index. Used for LSH bucketing in
    * the ANN scale path; never exported cross-engine. */
  def hyperplaneSketch(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    // hyperplane(b)[d] = hash(seed, b, d) mapped to {-1, +1}
    val bits = (0 until nBits).map { b =>
      val terms = (0 until dim).map { d =>
        val sign = if (scala.util.hashing.byteswap64(seed ^ (b.toLong << 32) ^ d) < 0) -1.0 else 1.0
        vec.getItem(d).cast("double") * lit(sign)
      }
      val proj = terms.reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }
}
