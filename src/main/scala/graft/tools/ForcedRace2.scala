package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.CountDownLatch

/** Forced-race exhibit #2: the FULL q45 round-0 shape — two stacked
  * shared cache entries (e0, edges-on-e0) consumed through an EAGER
  * localCheckpoint — with the owner's unpersist fired mid-checkpoint
  * (the pre-r12 release window). Sweeps unpersist target × delay.
  *
  * Usage: runMain graft.tools.ForcedRace2 [iters] [sfDir]
  */
object ForcedRace2 {
  def main(args: Array[String]): Unit = {
    val iters = args.lift(0).map(_.toInt).getOrElse(6)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-forced-race2")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def mkE0(s: SparkSession): DataFrame = {
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
      docs.select(col("doc_id").as("_x"),
          explode(graft.catalyst.ShingleExprs.shingleHashes(
            graft.functions.TextFunctions.tokens(col("text")), 3)).as("_y"))
        .filter(pmod(col("_y"), lit(7L)) =!= 0)
        .distinct()
    }

    val truth = mkE0(spark).select(col("_x")).distinct().count()
    println(s"truth (distinct _x): $truth")

    val targets = Seq("e0", "edges", "both")
    val delays = Seq(0L, 30L, 80L, 160L)
    var bad = 0
    for (i <- 1 to iters; target <- targets; delay <- delays) {
      val owner = spark.newSession()
      val consumer = spark.newSession()
      // owner materializes BOTH stacked entries (as a finished q45 would have)
      val aE0 = mkE0(owner).cache()
      val aEdges = aE0.repartition(4, col("_y")).sortWithinPartitions("_y").cache()
      aEdges.count()

      // consumer aliases both entries (cache() no-ops), then checkpoints
      val bE0 = mkE0(consumer).cache()
      val bEdges = bE0.repartition(4, col("_y")).sortWithinPartitions("_y").cache()
      val round0 = bEdges.select(col("_x").as("_id")).distinct()
        .withColumn("_rep", col("_id"))

      val tag = s"cons2-$i-$target-$delay"
      val jobStarted = new CountDownLatch(1)
      val listener = new SparkListener {
        override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
          if (Option(jobStart.properties.getProperty("spark.jobGroup.id")).contains(tag))
            jobStarted.countDown()
        }
      }
      spark.sparkContext.addSparkListener(listener)

      @volatile var result: Either[Throwable, Long] = Right(-1L)
      val t = new Thread(() => {
        consumer.sparkContext.setJobGroup(tag, "checkpoint")
        try {
          val current = round0.localCheckpoint()
          result = Right(current.count())
          graft.CacheScope.releaseLocalCheckpoint(current)
        } catch { case e: Throwable => result = Left(e) }
        finally consumer.sparkContext.clearJobGroup()
      }, tag)
      t.start()

      jobStarted.await()
      if (delay > 0) Thread.sleep(delay)
      if (target == "e0" || target == "both") aE0.unpersist(false)
      if (target == "edges" || target == "both") aEdges.unpersist(false)
      t.join()
      spark.sparkContext.removeSparkListener(listener)
      aE0.unpersist(false); aEdges.unpersist(false)
      bE0.unpersist(false); bEdges.unpersist(false)

      result match {
        case Right(n) if n == truth => // ok
        case Right(n) =>
          bad += 1
          println(s"!! iter $i target $target delay $delay: WRONG COUNT $n (truth $truth)")
        case Left(e) =>
          bad += 1
          println(s"!! iter $i target $target delay $delay: THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"forced-race2 sweep done: $bad bad outcomes over ${iters * targets.size * delays.size} trials")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
