package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}

/** Continuous-query building blocks (SURVEY.md §2C C6-C9, C16): the
  * streaming side of the engine's SQL surface. Everything is a transform
  * `DataFrame → DataFrame` so batch and streaming share one logical plan
  * language — the reference's browse SQL vs continuous SQL split
  * (`SELECT …` vs `INSERT INTO … SELECT STREAM …`) maps to running the
  * same transform under `read` or `readStream`.
  *
  * Watermarks bound state for the rolling-stream topics (reference
  * retention regime: `running-ais.sh:18-20`); at 100 TB scale every
  * stateful op here shuffles by its grouping key and keeps per-key state
  * bounded by the watermark, so state size tracks key cardinality — not
  * stream length.
  */
object StreamOps {

  /** C6: tumbling event-time window aggregation with lateness bound. */
  def tumblingAgg(
      df: DataFrame, tsCol: String, windowLen: String, watermark: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** C6: hopping (sliding) window aggregation. */
  def hoppingAgg(
      df: DataFrame, tsCol: String, windowLen: String, slide: String, watermark: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** C6: session window (gap-based) aggregation. */
  def sessionAgg(
      df: DataFrame, tsCol: String, gap: String, watermark: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** C7: stream–table enrichment. The dimension side is a static (or
    * compacted latest-by-key) table, broadcast so the stream never
    * shuffles — the `telecom_italia_data ⋈ telecom_italia_grid` shape the
    * reference's data design exists for. */
  def enrich(stream: DataFrame, dim: DataFrame, cond: Column,
      joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), cond, joinType)

  /** C8: stream–stream equi-join within an event-time bound. Both sides
    * get watermarks; the range condition lets Spark expire join state.
    * The join key includes `floor(ts / maxDelay)` (±1 buckets on the left,
    * via [[graft.operators.Relational.bucketedTimeJoin]]) so join state is
    * keyed by (user key, time bucket) — candidates per state key are
    * bounded by bucket occupancy instead of exploding per-key pairs. */
  def intervalJoin(
      left: DataFrame, leftTs: String, leftWm: String,
      right: DataFrame, rightTs: String, rightWm: String,
      keyCond: Column, maxDelay: String): DataFrame =
    graft.operators.Relational.bucketedTimeJoin(
        left.withWatermark(leftTs, leftWm), leftTs,
        right.withWatermark(rightTs, rightWm), rightTs,
        keyCond, maxDelay)
      .drop("_gbkt_l", "_gbkt_r")

  /** C9 (streaming side): latest-by-key over an update stream — the
    * compacted-topic table view, kept incrementally with
    * `mapGroupsWithState`. Emits, per trigger, the new latest row for
    * every key that changed (update output mode). State per key = one
    * row. The batch analog is `graft.operators.Relational.latestByKey`.
    *
    * Ordering is (orderCol, then all remaining columns' natural row
    * order is irrelevant): the row with the greatest orderCol value wins;
    * ties keep the latest-seen row (arrival order), matching Kafka
    * compaction's offset semantics when orderCol is the offset.
    */
  def latestByKeyStream(df: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val schema = df.schema
    val orderIdx = schema.fieldIndex(orderCol)
    val orderDt = schema(orderIdx).dataType
    implicit val rowEnc: Encoder[Row] = ExpressionEncoder(schema)

    def gte(a: Row, b: Row): Boolean = {
      if (b.isNullAt(orderIdx)) return true
      if (a.isNullAt(orderIdx)) return false
      orderDt match {
        case LongType => a.getLong(orderIdx) >= b.getLong(orderIdx)
        case IntegerType => a.getInt(orderIdx) >= b.getInt(orderIdx)
        case DoubleType => a.getDouble(orderIdx) >= b.getDouble(orderIdx)
        case TimestampType => !a.getTimestamp(orderIdx).before(b.getTimestamp(orderIdx))
        case StringType => a.getString(orderIdx) >= b.getString(orderIdx)
        case dt => throw new UnsupportedOperationException(
          s"latestByKeyStream order column type ${dt.catalogString}")
      }
    }

    df.groupByKey(r => String.valueOf(r.getAs[Any](keyCol)))(Encoders.STRING)
      .mapGroupsWithState[Row, Row](GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state) =>
          var best: Row = state.getOption.orNull
          rows.foreach { r => if (best == null || gte(r, best)) best = r }
          state.update(best)
          best
      }
  }

  /** Streaming exact dedup on key columns; with an event-time column +
    * watermark the key state is dropped once the watermark passes
    * (`dropDuplicatesWithinWatermark` semantics via ts-bounded keys). */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String, keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicates(keys :+ tsCol)
}
