package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Deterministic rate-modulated generator source — the Spark-native
  * re-creation of the reference's continuous data generators
  * (SURVEY.md §2A A2: `normcat -r RATE -j JITTER -p PERIOD -c -v`,
  * rates/jitters/periods per dataset in `sample-data/variables.env:11-13`).
  *
  * Per-second emission rate:
  *   rate(u) = max(0, round(r + a·sin(2π·u / p) + jitter_u)),
  * with `jitter_u` a seeded uniform integer in [-j, +j] — deterministic,
  * so a given (options, offset range) always yields identical records:
  * generators double as reproducible test fixtures, exactly the role the
  * reference's committed sample datasets play.
  *
  * Options: `rowsPerSecond` (r), `jitter` (j), `periodSeconds` (p),
  * `amplitude` (a, default r/2), `seed`, `startTimestamp` (epoch millis of
  * the first record), `numPartitions`, `advancePerBatchSeconds` — when
  * set, the logical clock advances by that many seconds per trigger
  * instead of following the wall clock (fully deterministic streams for
  * tests; leave unset for real-time pacing) — and `maxRecordsPerTrigger`:
  * Spark-native backpressure via `SupportsAdmissionControl` (the engine
  * analog of the reference's rate-limited producers / Kafka
  * `maxOffsetsPerTrigger`, SURVEY §4). Under sustained capping the
  * logical clock falls behind the schedule — deferred records are
  * emitted, never dropped.
  *
  * Schema: `ts TIMESTAMP, seq BIGINT, value DOUBLE` (value = seeded
  * uniform in [0,1) keyed by seq — the "payload" a real topic would carry).
  */
class RateModulatedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rate"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RateModulatedSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RateModulatedTable(RateConf(properties.asScala.toMap))
}

object RateModulatedSource {
  val Schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

final case class RateConf(
    rowsPerSecond: Double, jitter: Double, periodSeconds: Double, amplitude: Double,
    seed: Long, startTimestampMs: Long, numPartitions: Int, advancePerBatchSeconds: Long,
    maxRecordsPerTrigger: Long = 0L) {

  /** Deterministic per-second rate (records emitted during second u). */
  def rateAt(u: Long): Long = {
    val jit =
      if (jitter <= 0) 0.0
      else {
        val r = RateModulatedSource.splitmix64(seed ^ u)
        // uniform in [-jitter, +jitter]
        ((r >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0) * jitter
      }
    val sine = if (periodSeconds > 0) amplitude * math.sin(2.0 * math.Pi * u / periodSeconds) else 0.0
    math.max(0L, math.round(rowsPerSecond + sine + jit))
  }

  /** Total records emitted in seconds [0, seconds). */
  def cumulative(seconds: Long): Long = {
    var s = 0L
    var u = 0L
    while (u < seconds) { s += rateAt(u); u += 1 }
    s
  }
}

object RateConf {
  def apply(opts: Map[String, String]): RateConf = {
    def d(k: String, dv: Double) = opts.get(k).map(_.toDouble).getOrElse(dv)
    def l(k: String, dv: Long) = opts.get(k).map(_.toLong).getOrElse(dv)
    val r = d("rowsPerSecond", 10.0)
    RateConf(
      rowsPerSecond = r,
      jitter = d("jitter", 0.0),
      periodSeconds = d("periodSeconds", 0.0),
      amplitude = d("amplitude", r / 2.0),
      seed = l("seed", 42L),
      startTimestampMs = l("startTimestamp", 0L),
      numPartitions = l("numPartitions", 4L).toInt,
      advancePerBatchSeconds = l("advancePerBatchSeconds", 0L),
      maxRecordsPerTrigger = l("maxRecordsPerTrigger", 0L))
  }
}

class RateModulatedTable(conf: RateConf) extends Table with SupportsRead {
  override def name(): String = "graft_rate_modulated"
  override def schema(): StructType = RateModulatedSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RateModulatedSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RateModulatedStream(conf)
      }
    }
}

/** Offset = (records emitted, logical seconds elapsed). Carrying the
  * logical clock INSIDE the offset is what makes the deterministic mode
  * restart-safe: the clock is recovered from the checkpointed offset log,
  * never from mutable stream state. */
final case class CountOffset(count: Long, seconds: Long = 0L) extends Offset {
  override def json(): String = s"$count:$seconds"
}

class RateModulatedStream(conf: RateConf) extends MicroBatchStream with SupportsAdmissionControl {

  private val startWallMs = System.currentTimeMillis()
  // High-water offset this stream has OBSERVED (restored from the offset
  // log on recovery, or planned/committed this run). latestOffset derives
  // the next clock value from it and never mutates it: Spark may invoke
  // latestOffset any number of times per trigger (and again after a
  // restart), so the advance must be a pure function of durable progress —
  // the round-2 shape advanced a var per CALL, drifting the clock.
  @volatile private var highWater = CountOffset(0L, 0L)

  private def observe(o: Offset): Offset = {
    val c = o.asInstanceOf[CountOffset]
    // merge per FIELD, not per offset: an offset that advances only one
    // field (e.g. a restored legacy count-only checkpoint) must never drag
    // the other field backwards, or latestOffset could plan end < start
    synchronized {
      highWater = CountOffset(
        math.max(c.count, highWater.count), math.max(c.seconds, highWater.seconds))
    }
    o
  }

  override def initialOffset(): Offset = CountOffset(0L, 0L)

  override def latestOffset(): Offset =
    if (conf.advancePerBatchSeconds > 0) {
      val seconds = highWater.seconds + conf.advancePerBatchSeconds
      CountOffset(conf.cumulative(seconds), seconds)
    } else {
      // Wall-clock mode must stay MONOTONE across restarts too: a fresh
      // instance's wall clock starts over, so without the floor the first
      // post-restart offset would regress below the checkpointed one and
      // the source would emit nothing until wall time re-caught the log.
      val seconds = math.max(
        (System.currentTimeMillis() - startWallMs) / 1000, highWater.seconds)
      CountOffset(math.max(conf.cumulative(seconds), highWater.count), seconds)
    }

  /** Backpressure (SupportsAdmissionControl): Spark calls this form when
    * the source declares a read limit. A capped batch stops at
    * `start + maxRows` records; the offset's logical-seconds field is
    * wound back to the smallest second covering the capped prefix, so the
    * next trigger resumes the SCHEDULE where emission actually got to —
    * deferred records drain in later batches, none are skipped. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = latestOffset().asInstanceOf[CountOffset]
    limit match {
      case m: ReadMaxRows =>
        val from = start.asInstanceOf[CountOffset].count
        if (target.count - from <= m.maxRows) target
        else {
          val capped = from + m.maxRows
          CountOffset(capped, secondsCovering(capped))
        }
      case _ => target
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    if (conf.maxRecordsPerTrigger > 0) ReadLimit.maxRows(conf.maxRecordsPerTrigger)
    else ReadLimit.allAvailable()

  // Memoized schedule walk: capped offsets are monotone across triggers,
  // so the walker resumes from where the last call stopped instead of
  // re-summing from second 0 every trigger (a days-old capped stream
  // would otherwise pay millions of rateAt() steps per trigger).
  private var walkSeconds = 0L
  private var walkCum = 0L // invariant: walkCum == cumulative(walkSeconds)

  /** Smallest logical second s with cumulative(s) >= count. */
  private def secondsCovering(count: Long): Long = synchronized {
    if (count <= 0L) return 0L
    if (count <= walkCum && walkSeconds > 0L) return walkSeconds // same/earlier trigger replay
    var zeroStreak = 0L
    while (walkCum < count) {
      val r = conf.rateAt(walkSeconds)
      walkCum += r
      walkSeconds += 1
      zeroStreak = if (r == 0L) zeroStreak + 1 else 0L
      // a schedule stuck at rate 0 can never cover the offset (e.g. a
      // checkpoint restored under changed zero-rate options) — fail
      // instead of spinning the driver forever
      if (zeroStreak > 10000000L) throw new IllegalStateException(
        s"rate schedule cannot cover offset count $count (rate stuck at 0)")
    }
    walkSeconds
  }

  override def deserializeOffset(json: String): Offset = {
    val parts = json.split(":", 2)
    val count = parts(0).toLong
    // a legacy count-only offset carries no clock; derive it from the
    // schedule so the count == cumulative(seconds) invariant holds on
    // upgrade instead of restoring seconds = 0 under a wound-up count
    val seconds = if (parts.length > 1) parts(1).toLong else secondsCovering(count)
    observe(CountOffset(count, seconds))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = observe(end).asInstanceOf[CountOffset].count
    val n = math.max(1, math.min(conf.numPartitions.toLong, e - s)).toInt
    (0 until n).map { i =>
      val lo = s + (e - s) * i / n
      val hi = s + (e - s) * (i + 1) / n
      RatePartition(lo, hi, conf): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = RateReaderFactory

  override def commit(end: Offset): Unit = { observe(end); () }
  override def stop(): Unit = ()
}

final case class RatePartition(startSeq: Long, endSeq: Long, conf: RateConf)
    extends InputPartition

object RateReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RatePartition]
    new PartitionReader[InternalRow] {
      private var seq = p.startSeq
      // walk the per-second schedule up to the first record of this range
      private var second = 0L
      private var cumAtSecond = 0L // records emitted before `second`
      private var rate = p.conf.rateAt(0L)
      advanceToSecondOf(p.startSeq)

      private def advanceToSecondOf(target: Long): Unit = {
        while (cumAtSecond + rate <= target) {
          cumAtSecond += rate
          second += 1
          rate = p.conf.rateAt(second)
        }
      }

      override def next(): Boolean = seq < p.endSeq
      override def get(): InternalRow = {
        advanceToSecondOf(seq)
        val within = seq - cumAtSecond
        val microsInSecond = if (rate > 0) within * (1000000L / math.max(1L, rate)) else 0L
        val tsMicros = p.conf.startTimestampMs * 1000L + second * 1000000L + microsInSecond
        val value =
          (RateModulatedSource.splitmix64(p.conf.seed ^ (seq * 0x9E3779B97F4A7C15L)) >>> 11) *
            (1.0 / (1L << 53))
        val row = InternalRow(tsMicros, seq, value)
        seq += 1
        row
      }
      override def close(): Unit = ()
    }
  }
}
