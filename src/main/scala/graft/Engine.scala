package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap for the graft engine.
  *
  * The reference stack (see SURVEY.md §0) runs each engine process in a
  * ~1.3 GB heap and declares per-topic parallelism 1-5
  * (reference: `sample-data/variables.env:4`, `supervisord.templates.d/10-lenses.conf:3`).
  * We map that to one SparkSession tuned for local[32] testing but with
  * settings chosen to survive a 1000-executor cluster:
  *
  *   - AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
  *     partition counts when data volume jumps 100×.
  *   - shuffle.partitions=32 locally (matches cores); on a real cluster this
  *     is overridden by AQE's coalescing from an initial higher value.
  *   - autoBroadcastJoinThreshold raised to 64 MB: every dimension table in
  *     the star schema (region/nation/customer/supplier/part) and the
  *     reference's compacted `telecom_italia_grid` topic (10k rows,
  *     SURVEY.md §4) should broadcast, never shuffle.
  */
object Engine {
  val ShufflePartitions = 32

  def session(
      appName: String = "graft",
      master: String = s"local[$ShufflePartitions]",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", ShufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS): without this flag every
      // events-based query crashes on scan (all other entry points set it)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // custom expressions as SQL functions + graft optimizer rules
      .config("spark.sql.extensions", "graft.catalyst.GraftExtensions")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
