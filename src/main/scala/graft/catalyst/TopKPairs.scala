package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state for [[TopKPairsAgg]]: the k smallest (key, payload)
  * pairs seen so far under the lexicographic (key asc, payload asc) order,
  * held as two primitive long arrays sorted ascending. Insertion is a
  * backward linear scan (k is small by contract — a sample quota or a
  * neighbor count, not a result page), merge is a standard two-pointer
  * sorted merge capped at k. */
final class TopKPairsBuffer(val k: Int) {
  val keys = new Array[Long](k)
  val payloads = new Array[Long](k)
  var size = 0

  @inline private def lt(k1: Long, p1: Long, k2: Long, p2: Long): Boolean =
    k1 < k2 || (k1 == k2 && p1 < p2)

  def insert(key: Long, payload: Long): Unit = {
    if (size == k && !lt(key, payload, keys(size - 1), payloads(size - 1))) return
    var i = if (size == k) size - 1 else size
    while (i > 0 && lt(key, payload, keys(i - 1), payloads(i - 1))) {
      keys(i) = keys(i - 1); payloads(i) = payloads(i - 1); i -= 1
    }
    keys(i) = key; payloads(i) = payload
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKPairsBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.keys(i), o.payloads(i)); i += 1 }
  }
}

/** Native Catalyst bounded top-k aggregation over (sortKey, payload) long
  * pairs — the imperative twin of [[graft.functions.TopKAgg]], kept
  * semantically identical (k smallest by (key asc, payload asc), output
  * the sorted `array<struct<_1,_2>>`) but ~an order of magnitude cheaper
  * per input row: the typed `Aggregator` pays an ExpressionEncoder
  * round-trip of a `List[(Long, Long)]` buffer per update, which at
  * pair-stream volume (the kNN graph pushes O(N²/blocks) scored rows
  * through the aggregation) dominates the operator. This implementation
  * updates two primitive long arrays in place and serializes the buffer
  * as 16·size bytes only at shuffle boundaries.
  *
  * State is bounded at k pairs per group at EVERY stage (partial maps,
  * shuffle, final merge) — the property that keeps per-query top-k safe
  * on a hot key at 100 TB, now without the encoder tax. */
case class TopKPairsAgg(
    keyExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {
  require(k >= 1, "k >= 1")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  // fail at ANALYSIS, not mid-task: the replaced udaf(TopKAgg) path cast
  // inputs implicitly via its encoder, and a raw asInstanceOf on an
  // Integer column would otherwise throw on the executors. (The
  // [[TopKPairs.topKPairs]] helper casts for the caller; this guards
  // direct Expression construction.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (keyExpr.dataType == LongType && payloadExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs expects (BIGINT, BIGINT) inputs, got " +
        s"(${keyExpr.dataType.catalogString}, ${payloadExpr.dataType.catalogString}) — cast first")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("_1", LongType, nullable = false)
      .add("_2", LongType, nullable = false),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null)
      b.insert(kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, o: TopKPairsBuffer): TopKPairsBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKPairsBuffer): Any = {
    val rows = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      rows(i) = new GenericInternalRow(Array[Any](b.keys(i), b.payloads(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKPairsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.keys(i)); bb.putLong(b.payloads(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKPairsBuffer(k)
    var i = 0
    // inputs arrive already sorted — appending in order keeps the
    // backward-scan insert O(1) per element here
    while (i < n) { b.insert(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairsAgg =
    copy(keyExpr = c(0), payloadExpr = c(1))
  override def prettyName: String = "top_k_pairs"
}

object TopKPairs {
  /** `top_k_pairs(sortKey, payload, k)` as a Column aggregate: the k
    * smallest (key, payload) pairs, ascending, as `array<struct<_1,_2>>`
    * — drop-in for `udaf(new TopKAgg(k))(key, payload)`. */
  def topKPairs(key: Column, payload: Column, k: Int): Column =
    Cols.column(TopKPairsAgg(
      Cols.expression(key.cast("long")), Cols.expression(payload.cast("long")), k)
      .toAggregateExpression())
}
