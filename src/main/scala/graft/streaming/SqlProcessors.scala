package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Continuous-SQL processor surface — the engine's analog of the
  * reference's SQL processors (`INSERT INTO target SELECT STREAM … FROM
  * source`; browsing SQL is the bounded form). Sources are registered as
  * temp views (streaming or static — Spark SQL composes both in one
  * statement), and a processor is an INSERT INTO statement whose SELECT
  * runs continuously into a named, checkpointed pipeline.
  *
  * The SQL dialect is Spark SQL itself (a superset of the reference's
  * surface); this class supplies the registration + lifecycle glue, and
  * `Pipelines` supplies naming/checkpoints/stop/drop (EP3).
  */
class SqlProcessors(spark: SparkSession, pipelines: Pipelines) {

  private val InsertInto = """(?is)\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+(SELECT\b.*)""".r

  /** Register a source (streaming or static DataFrame) as a queryable
    * view. Streaming views make any SELECT over them a continuous query. */
  def registerSource(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Bounded browse query (EP2): plain SQL over the registered views. */
  def browse(sql: String): DataFrame = spark.sql(sql)

  /** Submit a continuous processor: `INSERT INTO <target> SELECT …`.
    * The SELECT must read at least one streaming view; the target becomes
    * a memory sink table named `<target>` (queryable via `spark.table`)
    * or, if `targetPath` is given, an append-mode parquet directory.
    * Returns the running query, registered under `name` in [[Pipelines]]. */
  def submit(name: String, insertSql: String, targetPath: Option[String] = None,
      outputMode: String = "append"): StreamingQuery =
    insertSql match {
      case InsertInto(target, select) =>
        val df = spark.sql(select)
        require(df.isStreaming,
          "processor SELECT must read a streaming source; use browse() for bounded SQL")
        pipelines.start(name, df, w => targetPath match {
          case Some(path) => w.format("parquet").option("path", path).outputMode(outputMode)
          case None => w.format("memory").queryName(target).outputMode(outputMode)
        })
      case _ => throw new IllegalArgumentException(
        s"not an INSERT INTO … SELECT … statement: $insertSql")
    }
}
