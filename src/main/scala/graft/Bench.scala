package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {

  /** Fixed CPU-bound calibration probe: 256M xxhash64 evaluations across
    * 32 tasks, no I/O, no shuffle — its wall time depends only on how
    * much CPU this box actually gives us, which is exactly the signal a
    * contention sentinel needs (an external load inflates it in direct
    * proportion while leaving nothing else to vary). Sized to ~0.33 s
    * idle: long enough that scheduler jitter and residual JIT warmth
    * are noise, short enough to not distort the bench itself. */
  private def calibSec(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // pmod keeps the running sum far from long overflow (ANSI mode throws)
    spark.range(0, 256L << 20, 1, 32)
      .select(sum(pmod(xxhash64(col("id")), lit(1000000)))).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** Idle-box reference for [[calibSec]] at local[32], measured on this
    * machine (warm JVM, spread of 6 idle samples 0.28-0.37 s —
    * BASELINE.md r7). The r6 driver bench was load-polluted 5-18× on
    * heavy queries and only an idle-box judge rerun could adjudicate it;
    * with the sentinel the bench convicts itself instead. */
  val CalibIdleSec = 0.33
  /** The fixed 32-task probe takes ⌈32/cpus⌉ task waves and one wave is
    * the idle 0.33 s, so the reference scales by the wave count — NOT
    * linearly in 32/cpus: at cpus=64 there is still one 32-task wave
    * (0.33 s, not 0.165 — linear scaling would convict an idle box),
    * and at cpus=24 the trailing 8 tasks are a full second wave
    * (0.66 s, not 0.44). */
  def calibIdleRef(cpus: Int): Double =
    CalibIdleSec * math.ceil(32.0 / cpus.max(1))
  /** ANY calibration sample exceeding the idle reference by this factor
    * flips `polluted` — the measurement channel, not the code, is then
    * the prime suspect for any per-query regression in the same run. */
  val PollutionFactor = 1.5
  /** A probe also runs every this-many queries: a transient load that
    * arrives after the pre-probe and exits before the post-probe (the
    * exact r6 failure window) still lands on a mid-run sample. ~6
    * samples over the 91-query gate ≈ 4 s of overhead, outside the
    * per-query timers. */
  val CalibEvery = 15

  /** One sentinel sample = the MIN of two back-to-back probes: a GC or
    * JIT spike right after a heavy query inflates one probe, a genuine
    * external load inflates both — min-of-2 keeps the single-sample
    * pollution rule safe on an idle box (an idle mid-run probe measured
    * 0.465 s once, 1.4× the reference, purely from scheduler debris). */
  private def calibSample(spark: SparkSession): Double =
    math.min(calibSec(spark), calibSec(spark))

  /** The PRIMARY pollution signal: the fraction of the whole box's CPU
    * capacity consumed by processes OTHER than this JVM, read straight
    * from `/proc/stat` (all-cpu busy jiffies) minus `/proc/self/stat`
    * (our utime+stime). Probe timing under a fair scheduler is
    * inherently marginal — a 24-spinner stress load inflates the probe
    * only 1.25-1.5×, exactly the band where idle GC noise lives — while
    * the external-CPU fraction separates cleanly: ≤1-2% on an idle box
    * (kernel threads), ~43% under the same stress load, ~50%+ under the
    * r6 concurrent-DuckDB failure mode. Returns (allBusy, selfBusy,
    * total) jiffy counters; consumers difference consecutive readings. */
  private def cpuStat(): Option[(Long, Long, Long)] =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      val idle = cpu(3) + cpu(4) // idle + iowait
      val self = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
      Some((cpu.sum - idle, self(13).toLong + self(14).toLong, cpu.sum))
    } catch { case _: Throwable => None } // non-Linux: timing rule only

  /** External-CPU share of one interval; None if /proc is unreadable. */
  private def extShare(a: Option[(Long, Long, Long)],
      b: Option[(Long, Long, Long)]): Option[Double] =
    for ((b0, s0, t0) <- a; (b1, s1, t1) <- b if t1 > t0)
      yield ((b1 - b0) - (s1 - s0)).toDouble / (t1 - t0)

  /** Any interval where other processes held more than this share of
    * the box flips `polluted`. Idle kernel-thread background is 1-2%;
    * the r6 failure mode is tens of percent. */
  val ExtCpuCeiling = 0.15

  // --- JVM-internal telemetry (round 10) -----------------------------------
  // The r9 verdict's open question: overlapping-gate medians climbed
  // +10-45% across a round with ZERO source changes, while the external-CPU
  // sentinel read clean every run — so whatever moves is INSIDE the JVM
  // (heap/GC pressure as 224 gates accumulate) or machine drift the probe
  // under-measures. These counters make the run carry its own answer: if
  // gc_ms on the slow queries and the probe-query samples both climb with
  // suite position, it's warm-JVM pressure; if they stay flat while wall
  // climbs, the box itself drifted.

  private def gcBeans = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
  }
  /** Cumulative stop-the-world GC milliseconds since JVM start (all
    * collectors); consumers difference consecutive readings. */
  private def gcMs(): Long = gcBeans.map(b => math.max(b.getCollectionTime, 0L)).sum
  private def gcCount(): Long = gcBeans.map(b => math.max(b.getCollectionCount, 0L)).sum

  private def heapPools = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getType == java.lang.management.MemoryType.HEAP && p.isValid)
  }
  /** Arm the per-query heap high-water: reset every heap pool's peak. */
  private def resetHeapPeaks(): Unit =
    heapPools.foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
  /** Heap high-water since the last reset, MiB (sum across heap pools —
    * an upper bound when pools peak at different instants, which is the
    * right direction for a pressure sentinel). */
  private def heapPeakMb(): Long =
    heapPools.map(p => try p.getPeakUsage.getUsed catch { case _: Throwable => 0L })
      .sum >> 20
  /** Heap currently used, MiB — sampled at the calibration marks to show
    * whether residency accumulates as the suite progresses. */
  private def heapUsedMb(): Long =
    (java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed) >> 20

  // --- Fixed-work cross-round ANCHOR (round 13) ----------------------------
  // The r12 verdict's open measurement question: a +11.3% overlap-230 delta
  // could not be split into "host drift" vs "code regression" because every
  // telemetry channel (calib probe, ext-CPU, GC, heap) is either within-run
  // or CPU-only. The anchor is a FIXED workload touching all three resource
  // axes a gate touches — parquet scan+decode, hash CPU, a high-cardinality
  // shuffle — over synthetic data written fresh each run (fixed generator,
  // fixed plan, no dependence on SF dir or inventory). Its wall time moves
  // ONLY with the machine, so any cross-round overlap comparison can be
  // reported raw AND anchor-normalized: delta_norm = delta_raw ×
  // (anchor_then / anchor_now). Bump AnchorVersion if the workload ever
  // changes — versions are not comparable.

  val AnchorVersion = 1
  val AnchorRows = 4L << 20 // 4Mi rows ≈ 1-2 s/run idle: big enough to swamp
                            // scheduler jitter, small enough for ~10 s total
  val AnchorN = 5

  /** Write the anchor's fixed synthetic table (untimed): 32 parquet
    * partitions of (id, key, val, payload) where every column derives from
    * `id` via xxhash64 — deterministic bytes, realistic decode cost. */
  private def anchorBuild(spark: SparkSession, dir: String): Unit =
    spark.range(0, AnchorRows, 1, 32)
      .select(col("id"),
        pmod(xxhash64(col("id")), lit(2L << 20)).as("key"),
        pmod(xxhash64(col("id") + 1), lit(1000)).as("v"),
        concat(lit("anchor-payload-"), conv(xxhash64(col("id") + 2), 10, 16)).as("payload"))
      .write.mode("overwrite").parquet(dir)

  /** One timed anchor run: scan all 4 columns (decode), per-row hash CPU on
    * the string payload, then a ~2M-group shuffle (map-side combine cannot
    * collapse it — real exchange volume) and a final global sum. */
  private def anchorSec(spark: SparkSession, dir: String): Double = {
    val t0 = System.nanoTime()
    spark.read.parquet(dir)
      // pmod BEFORE the sums: raw xxhash64 spans the full long range and
      // ANSI mode throws on sum overflow
      .select(col("key"),
        (pmod(xxhash64(col("payload")), lit(1000000000L)) + col("v") + col("id")).as("h"))
      .groupBy("key").agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
      .select(sum(pmod(col("s"), lit(1000000))) + sum(col("n"))).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** The drift probe: ONE fixed cheap gate re-measured at suite start,
    * at every calibration mark, and at the end — warm-JVM degradation is
    * then a measured series, not an inference from cross-round medians.
    * Min-of-2 like the calibration probe (a single post-heavy-query GC
    * spike must not masquerade as drift; genuine accumulated pressure
    * slows BOTH samples). */
  val ProbeQuery = "q04_agg_group"
  private def probeSample(spark: SparkSession, sfDir: String): Double = {
    def once(): Double = SparkEntry.queries.get(ProbeQuery).map { fn =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      finally CacheScope.release()
      (System.nanoTime() - t0) / 1e9
    }.getOrElse(-1.0)
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(appName = "graft-bench", master = s"local[$cpus]",
      extraConf = Map("spark.sql.shuffle.partitions" -> cpus))
    // Warmup: touch every table and force one codegen'd plan so the first
    // timed query doesn't absorb JVM/classloading/scan-footer costs.
    Tables.All.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries.get("q04_agg_group").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // ... and one streaming query, so the first timed streaming gate
    // doesn't absorb Structured Streaming's one-time machinery (state
    // store coordinator, streaming listener bus, checkpoint FS init).
    try SparkEntry.queries.get("q38_stream_hopping").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // Contention sentinel: one probe BEFORE the timed queries (after a
    // throwaway run so the calibration plan itself is warm), one every
    // CalibEvery queries — a transient load confined to the middle of
    // the run still lands on a sample — and one AFTER. All samples are
    // taken OUTSIDE the per-query timers.
    val calibSamples = scala.collection.mutable.ArrayBuffer[Double]()
    // Each mark stores TWO cpu readings — one taken before the mark's own
    // calibration/probe work and one after — so the ext-CPU interval for a
    // gate span runs from the PREVIOUS mark's post-probe reading to the
    // NEXT mark's pre-probe reading: the bench's own probe/calibration CPU
    // never sits inside (and never dilutes) the window the pollution
    // sentinel judges (r10 advice).
    val cpuMarks = scala.collection.mutable.ArrayBuffer[
      (Option[(Long, Long, Long)], Option[(Long, Long, Long)])]()
    // Telemetry series, one entry per calibration mark (start/every
    // CalibEvery/end): probe-query wall, cumulative GC ms/count, heap
    // residency. All sampled OUTSIDE the per-query timers.
    val probeSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val gcMarks = scala.collection.mutable.ArrayBuffer[Long]()
    val gcCountMarks = scala.collection.mutable.ArrayBuffer[Long]()
    val heapMarks = scala.collection.mutable.ArrayBuffer[Long]()
    def telemetryMark(): Unit = {
      val pre = cpuStat() // closes the preceding gate interval
      calibSamples += calibSample(spark)
      probeSamples += probeSample(spark, sfDir)
      gcMarks += gcMs(); gcCountMarks += gcCount(); heapMarks += heapUsedMb()
      cpuMarks += ((pre, cpuStat())) // opens the next gate interval
    }
    calibSec(spark)
    probeSample(spark, sfDir) // throwaway: the probe plan itself warms
    // Fixed-work anchor: build (untimed) + one throwaway (plan/codegen
    // warmth) + AnchorN timed samples BEFORE the suite, two more AFTER it
    // (late-JVM state). All outside the per-query timers.
    // The anchor dir must not outlive the run even when a gate throws —
    // try/finally below covers the whole suite body (ADVICE r13: a mid-
    // suite exception used to leak 32 partitions of 4Mi rows per failed
    // run).
    val anchorDir = java.nio.file.Files.createTempDirectory("graft-anchor").toString
    try {
    anchorBuild(spark, anchorDir)
    anchorSec(spark, anchorDir) // throwaway
    val anchorPre = (1 to AnchorN).map(_ => anchorSec(spark, anchorDir))
    telemetryMark()
    // Optional comma-separated subset for local iteration (driver leaves unset).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Optional per-query repeat count: report the MEDIAN of n runs inside
    // one warm JVM (single runs on this box carry ±30-50% variance on the
    // multi-job queries — BASELINE.md r5). Default 1 = driver-compatible.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(1).max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.length - 1) / 2)
    }
    // A throwing query must not hide inside rc 0: its name lands in the
    // `errors` field (it still reports its wall time — the time spent
    // failing is real) and the judge sees the failure in the artifact.
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    // Per-query telemetry follows the MEDIAN run: times carry (wall, gc,
    // heap-peak) per repeat and the reported gc/heap are the median-wall
    // run's own (a mean would blend a one-off full GC into every repeat).
    val gcByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    val heapByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    val gateSeq = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = gateSeq.zipWithIndex
      .map { case ((name, fn), i) =>
      if (i > 0 && i % CalibEvery == 0) telemetryMark()
      val times = (1 to repeat).map { _ =>
        resetHeapPeaks()
        val gc0 = gcMs()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case _: Throwable => if (!errors.contains(name)) errors += name
        }
        finally CacheScope.release() // inside the timer: release cost is part of the query
        ((System.nanoTime() - t0) / 1e9, gcMs() - gc0, heapPeakMb())
      }
      val med = times.sortBy(_._1).apply((times.length - 1) / 2)
      gcByQuery(name) = med._2
      heapByQuery(name) = med._3
      name -> med._1
    }.toMap
    telemetryMark()
    val anchorPost = (1 to 2).map(_ => anchorSec(spark, anchorDir))
    val idleRef = calibIdleRef(cpus.toInt)
    // PRIMARY rule: any inter-mark interval where other processes held
    // > ExtCpuCeiling of the box. Timing-probe rule is the fallback for
    // environments without /proc (and stays in the artifact for eyes).
    val extShares: Seq[Option[Double]] =
      cpuMarks.toList.sliding(2).toList.collect {
        case List(a, b) => extShare(a._2, b._1)
      }
    val extAvailable = extShares.nonEmpty && extShares.forall(_.isDefined)
    val polluted =
      if (extAvailable) extShares.flatten.exists(_ > ExtCpuCeiling)
      else calibSamples.exists(_ > idleRef * PollutionFactor)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calibJson = calibSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val extJson = extShares.map(_.map(v => f"$v%.3f").getOrElse("null"))
      .mkString("[", ",", "]")
    // Telemetry payload: the ordered gate list makes the gc/heap maps and
    // the mark series positionally interpretable (mark k sits after gate
    // k*CalibEvery); gc_marks_ms differenced = GC burned per 15-gate span.
    val probeJson = probeSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val gcMarksJson = gcMarks.mkString("[", ",", "]")
    val gcCountJson = gcCountMarks.mkString("[", ",", "]")
    val heapMarksJson = heapMarks.mkString("[", ",", "]")
    val gcQJson = gateSeq.map { case (k, _) =>
      "\"" + k + "\":" + gcByQuery.getOrElse(k, -1L) }.mkString("{", ",", "}")
    val heapQJson = gateSeq.map { case (k, _) =>
      "\"" + k + "\":" + heapByQuery.getOrElse(k, -1L) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val anchorPreJson = anchorPre.map(v => f"$v%.3f").mkString("[", ",", "]")
    val anchorPostJson = anchorPost.map(v => f"$v%.3f").mkString("[", ",", "]")
    val anchorMedian = median(anchorPre)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","anchor_version":$AnchorVersion,"anchor_sec":$anchorPreJson""" +
      f""","anchor_median":$anchorMedian%.3f,"anchor_post_sec":$anchorPostJson""" +
      s""","calib_pre":${calibSamples.head},"calib_post":${calibSamples.last}""" +
      s""","calib_samples":$calibJson,"calib_idle_ref":$idleRef""" +
      s""","ext_cpu_shares":$extJson,"ext_cpu_ceiling":$ExtCpuCeiling""" +
      s""","probe_query":"$ProbeQuery","probe_sec":$probeJson""" +
      s""","gc_marks_ms":$gcMarksJson,"gc_marks_count":$gcCountJson""" +
      s""","heap_used_mb_marks":$heapMarksJson""" +
      s""","gc_ms":$gcQJson,"heap_peak_mb":$heapQJson""" +
      s""","polluted":$polluted,"errors":$errJson}"""
    println(json)
    // Machine-readable handoff (round 8): the same JSON at a stable path,
    // so the driver's BENCH_r*.json can carry a parsed payload instead of
    // an sbt stdout blob. Override with SPARK_GRAFT_BENCH_OUT; best-effort
    // (an unwritable path must not fail the bench itself).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      // NonFatal only: an OOM/interrupt must propagate, not vanish into
      // a "could not write" line with the bench reporting success
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    } finally {
      try graft.catalog.GraftCatalog.deleteRecursively(
        java.nio.file.Paths.get(anchorDir))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.stop()
  }
}
