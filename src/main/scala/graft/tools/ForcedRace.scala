package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.CountDownLatch

/** Deterministic exhibit of the shared-cache-entry race (r12 root-cause
  * hunt): one thread materializes a cached frame two sessions share by
  * canonical-plan identity, a consumer thread then runs a query over the
  * SAME entry, and the owner fires `unpersist(blocking = false)` exactly
  * when the consumer's job starts (SparkListener-latched) — the pre-r12
  * CacheScope window (zero-decision inside the lock, unpersist outside;
  * or simply any release while an untracked consumer is mid-query).
  *
  * Sweeps a delay grid and reports every consumer result: a count below
  * the true value demonstrates the silent-wrong-answer; an exception
  * demonstrates the crash flavor; all-correct means the scan path is
  * robust and the corruption needs the cache-REGISTRATION race instead.
  *
  * Usage: runMain graft.tools.ForcedRace [iters] [sfDir]
  */
object ForcedRace {
  def main(args: Array[String]): Unit = {
    val iters = args.lift(0).map(_.toInt).getOrElse(20)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-forced-race")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the q45 shape in miniature: a moderately expensive derived frame
    // (shingle-hash explode) cached, then consumed via distinct+checkpoint
    def mkFrame(s: SparkSession) = {
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
      docs.select(col("doc_id").as("_x"),
          explode(graft.catalyst.ShingleExprs.shingleHashes(
            graft.functions.TextFunctions.tokens(col("text")), 3)).as("_y"))
        .filter(pmod(col("_y"), lit(7L)) =!= 0)
    }

    val truth = mkFrame(spark).distinct().count()
    println(s"truth (uncached distinct count): $truth")

    val delays = Seq(0L, 25L, 50L, 100L, 200L, 400L)
    var bad = 0
    for (i <- 1 to iters; delay <- delays) {
      val owner = spark.newSession()
      val consumer = spark.newSession()
      val a = mkFrame(owner).cache()
      a.count() // materialize the entry

      val b = mkFrame(consumer) // same canonical plan -> same entry
      b.cache() // no-op: entry exists (the pre-fix no-op+retain window)

      val jobStarted = new CountDownLatch(1)
      val listener = new SparkListener {
        override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
          if (Option(jobStart.properties.getProperty("spark.jobGroup.id"))
              .contains(s"consumer-$i-$delay")) jobStarted.countDown()
        }
      }
      spark.sparkContext.addSparkListener(listener)

      @volatile var result: Either[Throwable, Long] = Right(-1L)
      val t = new Thread(() => {
        consumer.sparkContext.setJobGroup(s"consumer-$i-$delay", "consumer query")
        try result = Right(b.distinct().count())
        catch { case e: Throwable => result = Left(e) }
        finally consumer.sparkContext.clearJobGroup()
      }, s"consumer-$i-$delay")
      t.start()

      jobStarted.await()
      if (delay > 0) Thread.sleep(delay)
      a.unpersist(false) // the owner's release mid-consumer-query
      t.join()
      spark.sparkContext.removeSparkListener(listener)
      b.unpersist(false)

      result match {
        case Right(n) if n == truth => // ok
        case Right(n) =>
          bad += 1
          println(s"!! iter $i delay $delay: WRONG COUNT $n (truth $truth)")
        case Left(e) =>
          bad += 1
          println(s"!! iter $i delay $delay: THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"forced-race sweep done: $bad bad outcomes over ${iters * delays.size} trials")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
