package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row}

/** Named continuous-pipeline manager — the engine's analog of the
  * reference's connector/processor lifecycle (SURVEY.md §3 EP3: the
  * Connect REST surface `kafka-tests.yml:165-207` lists/creates/inspects/
  * deletes named pipelines; Lenses SQL processors are
  * `INSERT INTO target SELECT STREAM …` with a name).
  *
  * Each pipeline = a named `StreamingQuery` with a stable checkpoint
  * directory under `checkpointRoot/<name>` — the consumer-group/offset
  * state of the reference maps to Spark's checkpoint (SURVEY.md §2B B5).
  * Restarting a pipeline with the same name resumes from its checkpoint
  * (at-least-once into idempotent sinks = effectively-once, the same
  * contract Connect gives).
  */
final case class PipelineInfo(
    name: String, id: String, runId: String, isActive: Boolean,
    lastBatchId: Long, numInputRows: Long, sink: String)

class Pipelines(checkpointRoot: String) {

  private val running = new ConcurrentHashMap[String, StreamingQuery]()

  /** Create-and-start a named pipeline: `df` (a streaming DataFrame,
    * already transformed) into a sink. `configure` finishes the writer
    * (format/options/outputMode); the checkpoint location and query name
    * are managed here. */
  def start(name: String, df: DataFrame,
      configure: DataStreamWriter[Row] => DataStreamWriter[Row],
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    require(!running.containsKey(name) || !running.get(name).isActive,
      s"pipeline '$name' is already running")
    // queryName defaults to the pipeline name; `configure` may override it
    // (e.g. a memory sink whose table name is the INSERT target).
    val q = configure(df.writeStream.queryName(name))
      .option("checkpointLocation", checkpointDir(name))
      .trigger(trigger)
      .start()
    running.put(name, q)
    q
  }

  /** EP3 list: all known pipelines with their live progress. */
  def list: Seq[PipelineInfo] = running.asScala.toSeq.sortBy(_._1).map {
    case (name, q) =>
      val p = Option(q.lastProgress)
      PipelineInfo(name, q.id.toString, q.runId.toString, q.isActive,
        p.map(_.batchId).getOrElse(-1L),
        p.map(_.numInputRows).getOrElse(0L),
        p.map(_.sink.description).getOrElse(""))
  }

  def get(name: String): Option[StreamingQuery] = Option(running.get(name))

  /** Graceful stop; checkpoint retained so a later `start` resumes. */
  def stop(name: String): Unit =
    Option(running.get(name)).filter(_.isActive).foreach(_.stop())

  /** Drop: stop and delete the checkpoint (the DELETE connector +
    * consumer-group cleanup of the reference corpus). */
  def drop(name: String): Unit = {
    stop(name)
    running.remove(name)
    val dir = Paths.get(checkpointDir(name))
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
  }

  def checkpointDir(name: String): String = s"$checkpointRoot/$name"

  /** Block until `name` has processed all currently-available input
    * (test/synchronization helper; mirrors `processAllAvailable`). */
  def awaitDrained(name: String): Unit =
    get(name).foreach(_.processAllAvailable())

  def stopAll(): Unit = running.asScala.values.foreach(q => if (q.isActive) q.stop())
}
