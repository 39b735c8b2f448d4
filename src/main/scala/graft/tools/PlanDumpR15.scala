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
      "q139_dedup_aware_split", "q161_concurrency",
      "q162_stream_concurrency", "q164_pareto")
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
    // The iterative gates (q132/q133/q135/q45/…) return a plan that
    // reads the final round's checkpoint, so their files above cannot
    // show the PER-ROUND join shape the r15 hint changes. Dump the
    // round plan explicitly, both shapes, exactly as the pageRank loop
    // builds it on q132's real edge frame (the GraphHintProbe/GraphSpec
    // construction): r14 = no hint (the checkpoint leaf has no size
    // stats → sort-merge, V side re-shuffled+sorted per round);
    // r15 = model-sized broadcast hint.
    if (suffix == "after") try {
      import org.apache.spark.sql.functions._
      val e = graft.operators.Similarity.ivfKnnGraph(
          graft.Tables.embeddings(spark, d), "vec_id", "embedding", k = 3)
        .select(col("query_id").cast("long").as("_s"),
          col("neighbor_id").cast("long").as("_d")).cache()
      e.count()
      val withDeg = e.join(e.groupBy("_s").agg(count(lit(1)).as("_deg")), "_s")
        .repartition(1, col("_s")).sortWithinPartitions("_s").cache()
      withDeg.count()
      val nodes = e.select(col("_s").as("_id")).union(e.select(col("_d").as("_id")))
        .distinct().repartition(1, col("_id")).sortWithinPartitions("_id").cache()
      nodes.count()
      val r = nodes.withColumn("_r", lit(1000000L)).localCheckpoint()
      def round(hint: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
        // the FULL round body as pageRank builds it: the rank-side join
        // (r is a stats-bearing checkpoint leaf — broadcasts either way
        // at gate scale) AND the nodes⋈sums finish, where `sums` is an
        // aggregation with no size estimate: unhinted it plans
        // sort-merge (exchanging BOTH model-sized sides every round;
        // AQE converts at runtime only after shuffling), hinted it
        // broadcasts outright.
        val sums = withDeg.join(hint(r.withColumnRenamed("_id", "_s")), "_s")
          .select(col("_d"), expr("_r div _deg").as("_c"))
          .groupBy("_d").agg(sum(col("_c")).as("_S"))
        nodes.join(hint(sums.withColumnRenamed("_d", "_id")), Seq("_id"), "left")
          .select(col("_id"),
            (lit(150000L) + expr("(85 * coalesce(_S, 0L)) div 100")).as("_r"))
      }
      for ((tag, h) <- Seq(
          ("pagerank_round_before_smj", identity[org.apache.spark.sql.DataFrame] _),
          ("pagerank_round_after_broadcast",
            (x: org.apache.spark.sql.DataFrame) => broadcast(x)))) {
        val plan = round(h).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$tag.txt"), plan + "\n")
        println(s"dumped $tag")
      }
      e.unpersist(); withDeg.unpersist(); nodes.unpersist()
      graft.CacheScope.release()
    } catch { case t: Throwable => println(s"FAILED round dump: ${t.getMessage}") }
    spark.stop()
  }
}
