package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed `Aggregator` (the Dataset API's custom-aggregation surface,
  * SURVEY.md §2C C19): single-pass count/mean/sample-variance over an
  * integer-valued measure.
  *
  * Numerically deterministic BY CONSTRUCTION, unlike Welford-style
  * updates: the buffer holds exact integer (n, Σx, Σx²) — order-free —
  * and the only floating-point ops are a fixed sequence of divisions at
  * finish time, so any engine computing the same formula gets the same
  * bits (the correctness gate hashes them). Overflow bound: |x| ≤ 3M keeps
  * Σx² < 2⁶³ at a trillion rows.
  */
final case class Moments(n: Long, mean: Double, variance: Double)

class MomentsAgg extends Aggregator[Long, (Long, Long, Long), Moments] {
  override def zero: (Long, Long, Long) = (0L, 0L, 0L)
  override def reduce(b: (Long, Long, Long), x: Long): (Long, Long, Long) =
    (b._1 + 1, b._2 + x, b._3 + x * x)
  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)
  override def finish(r: (Long, Long, Long)): Moments = {
    val n = r._1
    if (n == 0) Moments(0, Double.NaN, Double.NaN)
    else {
      val nd = n.toDouble
      val sum = r._2.toDouble
      val sumsq = r._3.toDouble
      val mean = sum / nd
      val variance = if (n < 2) Double.NaN else (sumsq - sum * sum / nd) / (nd - 1.0)
      Moments(n, mean, variance)
    }
  }
  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
