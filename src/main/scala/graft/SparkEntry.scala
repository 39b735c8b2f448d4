package graft

import graft.functions.{Portable, TimeFunctions}
import graft.queries._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2) as runnable
  * queries over the TESTDATA.md tables; `oracleSql` carries the equivalent
  * DuckDB SQL for the correctness gate. Query packs live in
  * `graft.queries.*`; operators in `graft.operators.*`.
  */
object SparkEntry {

  /** Flagship query (the SURVEY.md §7 minimum slice, batch analog):
    * 10-minute windowed event activity per user enriched with the
    * broadcast customer dimension — windowed agg (C6) + stream-table
    * join (C7) in one plan. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    RelationalQueries.events(spark, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(Portable.cents(col("value"))).as("value_cents"))
      .join(broadcast(Tables.customer(spark, d)),
        col("user_id") === col("c_custkey"), "left")
      .select(TimeFunctions.canonical(col("w.start")).as("window_start"),
        col("user_id"), col("n_events"), col("value_cents"), col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      AnnQueries.all ++ MultimodalQueries.all ++ StreamingQueries.all ++
      GraphQueries.all ++ WebQueries.all ++ RankQueries.all ++
      MetricsQueries.all ++ PrivacyQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approximate/engine-side ops)
    * get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      AnnQueries.oracles ++ MultimodalQueries.oracles ++ StreamingQueries.oracles ++
      GraphQueries.oracles ++ WebQueries.oracles ++ RankQueries.oracles ++
      MetricsQueries.oracles ++ PrivacyQueries.oracles
}
