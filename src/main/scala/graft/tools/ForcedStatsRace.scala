package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic exhibit of the r12 root cause — the Spark-level hazard
  * chain behind the silent-empty q45 (BASELINE.md writeup):
  *
  *   1. A cached entry's buffers are cleared WHILE a query is between
  *      planning and execution (in the engine this is CacheManager's
  *      dependent re-compile, `recacheByCondition`, fired by ANY
  *      unpersist of a plan the entry depends on — even cascade=false).
  *   2. The query's TableCacheQueryStage materialization job was
  *      submitted over the now-unpersisted RDD: its tasks see
  *      storageLevel=NONE, compute DIRECTLY, and the stage's Unit result
  *      handler never pulls the iterators — so the per-task completion
  *      listener counts every partition as materialized while the
  *      row-count accumulator counts NOTHING.
  *   3. The query's second scan of the same entry rebuilds the buffers
  *      RDD (non-null again); `isCachedColumnBuffersLoaded` then latches
  *      TRUE (partition counter == partition count) over a ZERO row-count
  *      accumulator.
  *   4. AQE's PropagateEmptyRelation trusts the runtime statistics
  *      (rowCount == 0) and rewrites dependent joins to EmptyRelation —
  *      silently empty results over INTACT data.
  *
  * This tool drives the interleaving from outside: the exact q45
  * dependency structure (a materialized base entry + a fresh derived
  * entry), a victim left-join scanning the derived frame twice, a
  * saturated scheduler so the materialization tasks queue, and the base
  * release latched to the victim's job start across a delay sweep.
  * RESULT OF RECORD (r12): 140 trials across three orchestrations, 0
  * corruptions — the AQE-internal window (clear between stage-job
  * submission and task launch, rebuild before the stats read) is finer
  * than listener-grain external control. The reproducer of record is
  * therefore `SoakRepro --legacy`, which restores the pre-r12 release
  * window and reproduces the EmptyRelation corruption within 1-4 soak
  * loops on EVERY attempt (with the in-flight paranoid dump capturing
  * the poisoned plan); the deterministic regression pins are
  * `CacheIsolationSpec` (the structural precondition is gone) plus the
  * soak batteries. This tool remains as the documented attempt and the
  * benign-case control: even under these forced interleavings the
  * data-level reads never corrupt.
  *
  * Usage: runMain graft.tools.ForcedStatsRace [attempts]
  */
object ForcedStatsRace {
  def main(args: Array[String]): Unit = {
    val attempts = args.lift(0).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-forced-stats-race")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // slow per-row compute widens every window in the chain
    val slow = udf((x: Long) => { Thread.sleep(3); x })
    def mkBase(s: SparkSession) =
      s.range(0, 200, 1, 4).select(slow(col("id")).as("_id"))
        .withColumn("_rep", col("_id") + 1000L)

    val truth = 200L
    var wrong = 0
    var emptyRelationSeen = 0
    val delays = Seq(0L, 10L, 25L, 60L, 120L)
    for (i <- 1 to attempts; delay <- delays) {
      // the exact q45 dependency structure: a BASE entry (e0's role) and a
      // DERIVED cached entry on top of it (propagated's role). Releasing
      // the base triggers CacheManager's dependent re-compile, which swaps
      // a FRESH builder under the derived entry while the victim query is
      // mid-flight on it.
      val base = mkBase(spark).cache()
      base.count() // base materialized (as e0 is before its release)
      val derived = base.filter(col("_id") >= 0).cache() // fresh builder, zero accumulators
      // the CC jump shape over the DERIVED frame: scanned twice by a left join
      val jump = derived
        .join(derived.select(col("_id").as("_rid"), col("_rep").as("_rrep")),
          col("_rep") === col("_rid"), "left")
        .select(col("_id"), coalesce(col("_rrep"), col("_rep")).as("_rep"))
      val tag = s"victim-$i-$delay"
      val jobStarted = new java.util.concurrent.CountDownLatch(1)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (Option(js.properties.getProperty("spark.jobGroup.id")).contains(tag))
            jobStarted.countDown()
      }
      spark.sparkContext.addSparkListener(listener)
      // saturate the scheduler (the soak's natural state): the victim's
      // materialization tasks QUEUE behind this, so the unpersist below
      // lands between task submission and task launch — the real window
      val hog = udf((x: Long) => { Thread.sleep(600); x })
      val noise = new Thread(() => {
        try spark.range(0, 4, 1, 4).select(hog(col("id")).as("x")).count()
        catch { case _: Throwable => () }
      }, s"noise-$i-$delay")
      noise.start()
      Thread.sleep(30) // let the noise job occupy every core
      @volatile var result: Long = -1L
      val t = new Thread(() => {
        spark.sparkContext.setJobGroup(tag, "victim")
        try result = jump.count()
        finally spark.sparkContext.clearJobGroup()
      }, tag)
      t.start()
      // the "dependent re-compile" at the deadly instant: the victim's
      // FIRST job (the TableCacheQueryStage materialization) has been
      // submitted over the entry's buffers RDD — clear those buffers NOW,
      // so its tasks compute at storageLevel NONE under the Unit handler
      // (partitions counted, rows not), and the victim's second scan
      // rebuilds the buffers before AQE reads the runtime statistics.
      jobStarted.await()
      if (delay > 0) Thread.sleep(delay)
      // the foreign release of the BASE plan — uncacheQuery(cascade=false)
      // runs recacheByCondition over the live DERIVED entry: clearCache +
      // fresh-builder swap under the victim
      base.unpersist(false)
      t.join()
      spark.sparkContext.removeSparkListener(listener)
      val plan = jump.queryExecution.executedPlan.toString
      val hasEmpty = plan.contains("EmptyRelation")
      if (hasEmpty) emptyRelationSeen += 1
      if (result != truth) {
        wrong += 1
        println(s"!! attempt $i delay $delay: count=$result (truth $truth), EmptyRelation in plan: $hasEmpty")
      }
      derived.unpersist(true)
      base.unpersist(true)
    }
    println(s"forced-stats-race: $wrong wrong counts, $emptyRelationSeen EmptyRelation plans, over ${attempts * delays.size} trials")
    spark.stop()
    // exit 0 either way: this is an exhibit of the hazard, recorded in
    // BASELINE.md — the engine-side regression gates are the soak specs
  }
}
