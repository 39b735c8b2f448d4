package graft.catalog

import org.apache.spark.sql.DataFrame

/** Physical table layout for the 100-TB deployment: bucketing and
  * partitioning are the two levers that remove work BEFORE any query
  * runs, and both are write-time decisions this engine makes explicit.
  *
  *   - [[writeBucketed]]: hash-bucket (and sort) a table by its join/agg
  *     key. Two tables bucketed by the same key into the same bucket
  *     count join with ZERO shuffle — the sort-merge join reads
  *     co-located buckets directly (`LayoutSpec` pins the Exchange-free
  *     plan). At 100 TB this converts every repeated fact-fact join or
  *     keyed re-aggregation from a full-network shuffle into a local
  *     merge; bucket count is sized so one bucket ≈ one task's worth of
  *     bytes (`spark.sql.files.maxPartitionBytes`).
  *   - [[writePartitioned]]: directory-partition a table by its coarse
  *     scan predicate columns (date, source, lang). Queries filtering on
  *     them prune entire directories at PLANNING time — the scan's
  *     `PartitionFilters` — so a one-day query over a 10-year corpus
  *     reads one day's files, not 0.03% of every file.
  *
  * Both write EXTERNAL tables (explicit `path`) registered in the
  * session catalog: the reference's topic-with-physical-properties
  * model (partitions / compaction / retention declared per topic —
  * SURVEY.md §1.1) mapped to lakehouse layout.
  */
object Layout {

  /** Write `df` as an external parquet table hash-bucketed (and sorted)
    * by `key` into `buckets` buckets. Joins/aggregations on `key`
    * between tables sharing (key, buckets) need no Exchange. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    require(buckets >= 1, "buckets >= 1")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Write `df` as an external parquet table directory-partitioned by
    * `partCols` (coarse, low-cardinality predicate columns only — a
    * high-cardinality partition column makes a small-files swamp). */
  def writePartitioned(df: DataFrame, table: String, path: String,
      partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "at least one partition column")
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCols: _*)
      .option("path", path)
      .saveAsTable(table)
  }
}
