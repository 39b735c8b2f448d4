package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming gate (BASELINE.md): the reference's steady state is FIVE
  * concurrent rate-modulated generators (AIS 10, reddit 15, taxi 20,
  * backblaze 5, telecom 6 rec/s) feeding independent consumers. Here: five
  * concurrent named pipelines over graft-rate sources at those exact
  * rates, sharing one SparkSession/scheduler, drained and validated
  * independently — the multi-tenant scheduling shape, not just one query
  * at a time.
  */
class ConcurrentPipelinesSpec extends SparkSpec {

  test("five concurrent generator pipelines at reference rates all drain correctly") {
    val out = Files.createTempDirectory("conc-out").toString
    val pipes = new Pipelines(Files.createTempDirectory("conc-ck").toString)
    val monitor = new Monitor().attach(spark)
    // (name, rate) per SURVEY §6 / variables.env:11-13; jitter 0 for exact counts
    val topics = Seq(("ais", 10), ("reddit", 15), ("taxi", 20), ("smart", 5), ("telecom", 6))
    try {
      topics.foreach { case (name, rate) =>
        pipes.start(name,
          spark.readStream.format("graft-rate")
            .option("rowsPerSecond", rate.toString).option("jitter", "0")
            .option("periodSeconds", "0")
            .option("advancePerBatchSeconds", "10").option("startTimestamp", "0")
            .load(),
          w => w.format("parquet").option("path", s"$out/$name").outputMode("append"))
      }
      assert(pipes.list.count(_.isActive) == 5)
      Thread.sleep(3000) // several logical batches on every pipeline
      topics.foreach { case (name, _) => pipes.stop(name) }

      topics.foreach { case (name, rate) =>
        val df = spark.read.parquet(s"$out/$name")
        val n = df.count()
        // constant rate, 10-logical-second batches: exact multiples
        assert(n > 0 && n % (rate * 10) == 0, s"$name produced $n (rate $rate)")
        // per-pipeline seq spaces are independent and dense
        assert(df.agg(min("seq"), max("seq")).collect()(0).toSeq == Seq(0L, n - 1))
      }
      // the monitor saw progress from all five queries
      val seen = monitor.metricsTable(spark)
        .select("queryName").distinct().collect().map(_.getString(0)).toSet
      assert(topics.map(_._1).toSet.subsetOf(seen), s"monitor saw only $seen")
    } finally {
      pipes.stopAll()
      monitor.detach(spark)
    }
  }
}
