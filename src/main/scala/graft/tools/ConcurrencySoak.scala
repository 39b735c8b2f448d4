package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Full-inventory concurrency soak — the BASELINE.md evidence arm of the
  * multi-tenant story (the CI arm is `ConcurrentGatesSpec`): run EVERY
  * gate in the inventory across N concurrent workers against one
  * SparkContext, under either session-sharing model, and hash-compare
  * every worker's every result against a serial reference pass.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_SOAK_SESSIONS=4]
  *   [SPARK_GRAFT_SOAK_MODE=shared|child] sbt "runMain graft.tools.ConcurrencySoak"
  *
  * Prints one JSON line:
  *   {"mode":…, "sessions":N, "gates":G, "serial_sec":…, "soak_sec":…,
  *    "per_session_sec":[…], "skew":maxSession/minSession,
  *    "mismatches":[…], "errors":[…]}
  *
  * Workers run rotated gate orders so different families genuinely
  * overlap; each worker releases its own CacheScope references per gate
  * (the thread-scoped + refcounted contract this soak exists to
  * exercise). Fingerprints sort columns by name and rows by value — the
  * same canonicalization as the DuckDB oracle compare, minus the oracle.
  */
object ConcurrencySoak {

  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    s"${rows.length}:${md.digest().map("%02x".format(_)).mkString}"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sessions = sys.env.get("SPARK_GRAFT_SOAK_SESSIONS").map(_.toInt).getOrElse(4)
    val mode = sys.env.getOrElse("SPARK_GRAFT_SOAK_MODE", "child")
    val spark = graft.Engine.session(appName = "graft-soak")
    spark.sparkContext.setLogLevel("ERROR")
    val gates = SparkEntry.queries.keys.toSeq.sorted

    // --- attribution telemetry (r15, VERDICT r14 item 5): where does the
    // default-isolation overhead vs shared scope actually go? Record
    // per-gate walls in BOTH phases, GC time per phase, and a 500 ms
    // sampler of CacheManager residency (cached bytes + entry count) —
    // enough to split the overhead between duplicate fixture caches
    // (residency ~ sessions×serial), the GC they induce, and plain
    // CPU-contention spread across all gates.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs(): Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    @volatile var sampling = true
    val cacheMaxBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val cacheMaxEntries = new java.util.concurrent.atomic.AtomicLong(0L)
    val sampler = new Thread(() => {
      while (sampling) {
        val info = spark.sparkContext.getRDDStorageInfo
        val b = info.map(_.memSize).sum + info.map(_.diskSize).sum
        cacheMaxBytes.getAndUpdate(m => math.max(m, b))
        cacheMaxEntries.getAndUpdate(m => math.max(m, info.length.toLong))
        Thread.sleep(500)
      }
    }, "soak-cache-sampler")
    sampler.setDaemon(true)

    val serialGateSec = TrieMap[String, Double]()
    val soakGateSec = TrieMap[String, Double]() // sum over workers

    def runInventory(s: SparkSession, order: Seq[String],
        sink: (String, String) => Unit,
        gateSink: (String, Double) => Unit): Unit =
      order.foreach { name =>
        val g0 = System.nanoTime()
        val fp = try fingerprint(SparkEntry.queries(name)(s, sfDir))
          finally graft.CacheScope.release()
        gateSink(name, (System.nanoTime() - g0) / 1e9)
        sink(name, fp)
      }

    val reference = TrieMap[String, String]()
    sampler.start()
    val serialGc0 = gcMs()
    val t0 = System.nanoTime()
    runInventory(spark, gates, (n, f) => reference(n) = f,
      (n, w) => serialGateSec(n) = w)
    val serialSec = (System.nanoTime() - t0) / 1e9
    val serialGcMs = gcMs() - serialGc0
    val serialCacheMaxMb = cacheMaxBytes.getAndSet(0L) / 1e6
    val serialCacheMaxN = cacheMaxEntries.getAndSet(0L)

    val results = TrieMap[Int, TrieMap[String, String]]()
    val walls = TrieMap[Int, Double]()
    val errors = TrieMap[Int, String]()
    val soakGc0 = gcMs()
    val t1 = System.nanoTime()
    val threads = (0 until sessions).map { w =>
      val t = new Thread(() => {
        // sharedscope: the OPT-IN same-tenant mode (r12 verdict item 5) —
        // workers adopt one cache scope id, so operator-internal persists
        // dedupe into shared CacheManager entries again (cross-worker
        // reuse); correctness then rides CacheScope's atomic refcounted
        // release. Runs on child sessions (the service shape).
        val s = if (mode == "shared") spark else spark.newSession()
        if (mode == "sharedscope") graft.Tables.enterSharedScope(424242L)
        val mine = TrieMap[String, String]()
        results(w) = mine
        val w0 = System.nanoTime()
        try runInventory(s, gates.drop(w * 57 % gates.size) ++
            gates.take(w * 57 % gates.size), (n, f) => mine(n) = f,
            (n, sec) => soakGateSec.updateWith(n) {
              case Some(v) => Some(v + sec); case None => Some(sec) })
        catch { case e: Throwable =>
          errors(w) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}" }
        finally {
          walls(w) = (System.nanoTime() - w0) / 1e9
          graft.Tables.exitSharedScope() // drains deferred unpersists (last member)
        }
      }, s"soak-$w")
      t.start(); t
    }
    threads.foreach(_.join())
    val soakSec = (System.nanoTime() - t1) / 1e9
    val soakGcMs = gcMs() - soakGc0
    sampling = false
    val soakCacheMaxMb = cacheMaxBytes.get() / 1e6
    val soakCacheMaxN = cacheMaxEntries.get()
    // per-gate attribution channel: a gate's soak MEAN wall (across the
    // N workers) vs its serial wall — overhead concentrated in a few
    // cache-heavy gates says duplicate fixture work; a uniform +X% says
    // scheduler/CPU contention.
    val regressed = gates
      .filter(g => serialGateSec.contains(g) && soakGateSec.contains(g))
      .map(g => (g, serialGateSec(g), soakGateSec(g) / sessions))
      .sortBy { case (_, s, m) => s - m }
      .take(12)

    val mismatches = (0 until sessions).flatMap { w =>
      gates.flatMap { g =>
        results(w).get(g) match {
          case Some(f) if f == reference(g) => None
          case Some(_) => Some(s"$w/$g:diverged")
          case None if errors.contains(w) => None // worker died, reported there
          case None => Some(s"$w/$g:missing")
        }
      }
    }
    val perSession = (0 until sessions).map(w => walls.getOrElse(w, -1.0))
    val skew = if (perSession.forall(_ > 0)) perSession.max / perSession.min else -1.0
    println(
      s"""{"mode":"$mode","sessions":$sessions,"gates":${gates.size},""" +
      f""""serial_sec":$serialSec%.1f,"soak_sec":$soakSec%.1f,""" +
      s""""per_session_sec":[${perSession.map(v => f"$v%.1f").mkString(",")}],""" +
      f""""skew":$skew%.2f,""" +
      s""""mismatches":[${mismatches.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""errors":[${errors.toSeq.sortBy(_._1).map(e => "\"" + e._1 + ":" + e._2 + "\"").mkString(",")}],""" +
      f""""serial_gc_ms":$serialGcMs,"soak_gc_ms":$soakGcMs,""" +
      f""""serial_cache_max_mb":$serialCacheMaxMb%.0f,"serial_cache_max_entries":$serialCacheMaxN,""" +
      f""""soak_cache_max_mb":$soakCacheMaxMb%.0f,"soak_cache_max_entries":$soakCacheMaxN,""" +
      s""""top_regressed":[${regressed.map { case (g, s, m) =>
        f"""{"gate":"$g","serial_s":$s%.2f,"soak_mean_s":$m%.2f}""" }.mkString(",")}]}""")
    spark.stop()
    if (mismatches.nonEmpty || errors.nonEmpty) sys.exit(1)
  }
}
