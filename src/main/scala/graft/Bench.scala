package graft

object Bench {
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
    // Optional comma-separated subset for local iteration (driver leaves unset).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Optional per-query repeat count: report the MEDIAN of n runs inside
    // one warm JVM (single runs on this box carry ±30-50% variance on the
    // multi-job queries — BASELINE.md r5). Default 1 = driver-compatible.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(1).max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.length - 1) / 2)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        finally CacheScope.release() // inside the timer: release cost is part of the query
        (System.nanoTime() - t0) / 1e9
      }
      name -> median(times)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
