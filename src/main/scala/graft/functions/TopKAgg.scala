package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded-state top-k aggregation: keeps the `k` smallest `(key, id)`
  * pairs per group under lexicographic order, as a typed `Aggregator`
  * with map-side partial combine.
  *
  * This is the hot-stratum answer to window-sort top-k
  * ([[graft.operators.Relational.topKPerGroup]]): a `row_number` window
  * sorts every row of a stratum inside one partition — a billion-doc
  * stratum is a single-task sort — while this aggregator's state is
  * O(k) per group at every stage: each map task reduces its slice to ≤ k
  * pairs before the shuffle, so shuffled bytes per stratum are
  * (#map-tasks × k), never the stratum's row count, and no single task
  * ever sorts more than its own slice. Insertion keeps the buffer
  * sorted, so a row past the current k-th bound is rejected in O(1)
  * after one comparison (the overwhelmingly common case on a hot
  * stratum); an admitted row pays an O(k) list splice.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, "k >= 1")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(b: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] =
    if (b.lengthCompare(k) >= 0 && !lt(x, b.last)) b
    else {
      val (pre, post) = b.span(e => lt(e, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.init else merged
    }

  override def zero: List[(Long, Long)] = Nil
  override def reduce(b: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] =
    insert(b, x)
  // Both sides are ≤ k, so the fold is O(k²) worst case with k small by
  // contract (a sample quota, not a result page).
  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(r: List[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
