package graft.tools

/** Diagnostic (r15): does the BT training memo hit ACROSS the family's
  * gates the way the suite runs them — q184 seeds, q188/q191/q222 reuse?
  * Prints the hit counter and wall per gate. Not part of any gate. */
object BtMemoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session(appName = "graft-bt-memo-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.All.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    graft.operators.Rank.clearTrainMemo()
    Seq("q184_bradley_terry", "q187_preference_leaderboard",
      "q188_stream_bradley_terry", "q191_leaderboard_agreement",
      "q222_stream_bt_bounded").foreach { name =>
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      finally graft.CacheScope.release()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"$name%-32s $w%7.3f s  hits=${graft.operators.Rank.trainMemoHits.get()}")
    }
    spark.stop()
  }
}
