package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Round-15 plan evidence: `.explain("formatted")` of every gate this
  * optimization round touched, one file per gate, into the directory
  * given as arg 0 with the suffix given as arg 1 (`before`/`after`).
  * Same session shape as the bench (local[32], shuffle partitions 32,
  * sf0.01 — plan SHAPE is scale-free; the bench numbers carry scale).
  * Gates whose build EXECUTES jobs (streaming drains, iterative loops)
  * dump the returned frame's plan — the loop-internal round plans are
  * pinned by RankSpec/GraphSpec instead. */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r15"
    val suffix = if (args.length > 1) args(1) else "after"
    val d = "/root/testdata/sf0.01"
    val spark = graft.Engine.session(appName = "graft-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.Tables.All.foreach { t =>
      try spark.read.parquet(s"$d/$t.parquet").count() catch { case _: Throwable => () }
    }
    val touched = Seq(
      "q184_bradley_terry", "q187_preference_leaderboard",
      "q188_stream_bradley_terry", "q191_leaderboard_agreement",
      "q222_stream_bt_bounded", "q194_ks_drift", "q202_concentration",
      "q208_average_precision", "q216_gains_table", "q192_roc_auc",
      "q132_pagerank", "q133_label_prop", "q135_curation_v6",
      "q45_dedup_clusters", "q46_curation_pipeline", "q55_embed_clusters",
      "q90_incremental_dedup", "q120_dedup_keep_best",
      "q139_dedup_aware_split")
    touched.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, d)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan + "\n")
        println(s"dumped $name ($suffix)")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getMessage}")
      } finally graft.CacheScope.release()
    }
    spark.stop()
  }
}
