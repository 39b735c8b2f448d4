package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming metrics surface (SURVEY.md §2B B7 / §2C C20): the reference
  * exports every service's JMX and surfaces consumer lag / throughput in
  * its UI; the Spark-native mapping is a `StreamingQueryListener` that
  * captures per-batch progress into a queryable metrics table.
  */
final case class QueryMetric(
    queryName: String, queryId: String, batchId: Long, timestamp: String,
    numInputRows: Long, inputRowsPerSecond: Double, processedRowsPerSecond: Double,
    stateRows: Long, durationMs: Long)

class Monitor extends StreamingQueryListener {

  private val metrics = new ConcurrentLinkedQueue[QueryMetric]()
  private val terminated = new ConcurrentLinkedQueue[String]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val duration = p.durationMs.asScala.values.map(_.longValue()).sum
    metrics.add(QueryMetric(
      Option(p.name).getOrElse(""), p.id.toString, p.batchId, p.timestamp,
      p.numInputRows,
      if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond,
      if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
      stateRows, duration))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminated.add(event.id.toString)

  /** The metrics table — one row per (query, micro-batch). */
  def metricsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metrics.asScala.toSeq.toDF()
  }

  def terminatedQueryIds: Seq[String] = terminated.asScala.toSeq

  def attach(spark: SparkSession): Monitor = { spark.streams.addListener(this); this }
  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
