package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal scalar functions (SURVEY.md §2 C13).
  *
  * The reference encodes time three ways (SURVEY.md §1.3): epoch-nanos long
  * (AIS, reference `sample-data/classAPositionReportSchema.json:87-91`),
  * epoch-millis long pre-bucketed to 10 minutes (telecom,
  * `TelecomItalia-Milano-SMS_Call_Internet.value.json:13-16`), and
  * `"yyyy-MM-dd HH:mm:ss"` strings (taxi,
  * `nyc_trip_records_yellow.value.json:12-21`). All three parse to Spark
  * TimestampType here.
  */
object TimeFunctions {

  /** Epoch-nanoseconds long → timestamp (micro precision, floor). */
  def fromEpochNanos(c: Column): Column = timestamp_micros((c / 1000).cast("long"))

  /** Epoch-milliseconds long → timestamp. */
  def fromEpochMillis(c: Column): Column = timestamp_millis(c)

  /** `yyyy-MM-dd HH:mm:ss` string → timestamp. */
  def fromDateTimeString(c: Column): Column = to_timestamp(c, "yyyy-MM-dd HH:mm:ss")

  /** Floor a timestamp onto epoch-aligned fixed buckets (tumbling window
    * start). Equivalent to DuckDB `time_bucket(INTERVAL n, ts)`. */
  def bucket(ts: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds)

  /** Render a timestamp as a canonical second-precision string — the only
    * form we export across engines (parquet timestamp phys-type semantics
    * differ between engines; strings do not). */
  def canonical(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH:mm:ss")
}
