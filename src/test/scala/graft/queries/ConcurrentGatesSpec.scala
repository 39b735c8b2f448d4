package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.TimeUnit
import scala.collection.concurrent.TrieMap

/** Suite-level concurrency soak (CI arm): the reference is a multi-tenant
  * SQL service — many browsing sessions run queries against one engine at
  * once — while Verify/Bench run every gate serially in one session. This
  * spec interleaves a family-spanning slice of the gate inventory across
  * N concurrent workers, under BOTH sharing models Spark offers:
  * one shared SparkSession (shared catalog/conf — the worst case for
  * temp-state cross-talk) and per-worker `newSession()` children (shared
  * SparkContext, isolated session state — the multi-tenant shape).
  *
  * Every worker's every result must hash-equal the serial reference. The
  * named risk surfaces this exercises:
  *  - [[graft.CacheScope]]'s registries (thread-scoped since r11: a
  *    global registry would let one worker's end-of-gate release free
  *    another's in-flight tracked CHECKPOINT — truncated lineage, lost
  *    blocks, a crash not a recompute);
  *  - streaming drains (per-call child sessions + counter-named memory
  *    sinks + AvailableNow temp checkpoints — nothing keyed by gate name);
  *  - operator-internal persists evicting each other under memory
  *    pressure (MEMORY_ONLY degrades to recompute, never wrong rows).
  *
  * The full-inventory soak (all gates × N sessions at the bench SF) runs
  * as `graft.tools.ConcurrencySoak` — recorded in BASELINE.md; this spec
  * keeps the invariant pinned in CI at spec scale.
  */
class ConcurrentGatesSpec extends SparkSpec {

  // One gate per major family, kept spec-sized at sf0.001: scan/agg/
  // window/join/latest, exact+minhash+cluster dedup, mixture, LM score,
  // exhaustive + IVF kNN builds, PageRank loop, classification report,
  // Fleiss kappa, and two streaming drains (windowed agg + item-grain
  // kappa monitor).
  private val inventory = Seq(
    "q01_scan_filter_project", "q04_agg_group", "q05_window_tumbling",
    "q08_join_star", "q10_latest_by_key", "q40_dedup_exact",
    "q41_dedup_minhash", "q45_dedup_clusters", "q70_weighted_mixture",
    "q92_lm_score", "q108_knn_graph", "q221_ivf_knn_graph",
    "q132_pagerank", "q212_class_report", "q217_fleiss_kappa",
    "q27_stream_tumbling", "q219_stream_fleiss_kappa")

  private val workers = 4

  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted.mkString("\n")
  }

  private def runInventory(s: SparkSession, order: Seq[String]): Map[String, String] =
    order.map { name =>
      val fp =
        try fingerprint(SparkEntry.queries(name)(s, sf))
        finally graft.CacheScope.release()
      name -> fp
    }.toMap

  private lazy val reference: Map[String, String] = runInventory(spark, inventory)

  /** Run the inventory on `workers` threads (each in a rotated order so
    * different gates genuinely overlap), return per-worker results or
    * rethrow the first worker failure. */
  private def soak(sessionFor: Int => SparkSession): Seq[Map[String, String]] = {
    val results = TrieMap[Int, Map[String, String]]()
    val failures = TrieMap[Int, Throwable]()
    val threads = (0 until workers).map { w =>
      val t = new Thread(() => {
        try {
          val rotated = inventory.drop(w * 4 % inventory.size) ++
            inventory.take(w * 4 % inventory.size)
          results(w) = runInventory(sessionFor(w), rotated)
        } catch { case e: Throwable => failures(w) = e }
      }, s"soak-worker-$w")
      t.start(); t
    }
    threads.foreach(_.join(TimeUnit.MINUTES.toMillis(20)))
    assert(threads.forall(!_.isAlive), "a soak worker wedged (20 min)")
    failures.headOption.foreach { case (w, e) =>
      fail(s"worker $w threw ${e.getClass.getSimpleName}: ${e.getMessage}", e)
    }
    (0 until workers).map(results(_))
  }

  private def assertAllMatch(runs: Seq[Map[String, String]]): Unit =
    runs.zipWithIndex.foreach { case (got, w) =>
      inventory.foreach { name =>
        assert(got(name) == reference(name),
          s"worker $w diverged from the serial reference on $name")
      }
    }

  test("concurrent workers sharing ONE SparkSession reproduce every gate hash") {
    reference // force the serial reference BEFORE any concurrency (ADVICE
    // r11: a lazily-computed reference after the soak would inherit any
    // persistently-corrupted shared state and pass vacuously)
    assertAllMatch(soak(_ => spark))
  }

  test("concurrent newSession() workers (multi-tenant shape) reproduce every gate hash") {
    reference
    assertAllMatch(soak(_ => spark.newSession()))
  }

  test("concurrent SHARED-SCOPE workers (opt-in same-tenant mode) reproduce every gate hash") {
    // The r13 opt-in mode: workers adopt one cache scope, so CacheManager
    // dedupes their operator-internal persists into SHARED entries — the
    // exact precondition of the r12 silent-empty chain. Safety rides the
    // deferred-drain release (unpersists queue until the last member
    // exits); a refcount-only variant of this mode diverged in soak
    // loop 1 (BASELINE.md r13), so this arm is the CI pin that the
    // deferral stays load-bearing.
    reference
    val results = TrieMap[Int, Map[String, String]]()
    val failures = TrieMap[Int, Throwable]()
    val threads = (0 until workers).map { w =>
      val t = new Thread(() => {
        graft.Tables.enterSharedScope(4242L)
        try {
          val rotated = inventory.drop(w * 4 % inventory.size) ++
            inventory.take(w * 4 % inventory.size)
          results(w) = runInventory(spark.newSession(), rotated)
        } catch { case e: Throwable => failures(w) = e }
        finally graft.Tables.exitSharedScope() // last member out drains
      }, s"soak-sharedscope-$w")
      t.start(); t
    }
    threads.foreach(_.join(TimeUnit.MINUTES.toMillis(20)))
    assert(threads.forall(!_.isAlive), "a soak worker wedged (20 min)")
    failures.headOption.foreach { case (w, e) =>
      fail(s"worker $w threw ${e.getClass.getSimpleName}: ${e.getMessage}", e)
    }
    assertAllMatch((0 until workers).map(results(_)))
  }
}
