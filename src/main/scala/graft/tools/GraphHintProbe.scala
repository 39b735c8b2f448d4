package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r15 diagnostic: same-JVM INTERLEAVED A/B of the pageRank round loop —
  * SMJ (r14 shape: the V-row rank side re-shuffles+sorts per round) vs
  * model-sized broadcast hint — on q132's real edge frame. Interleaving
  * (A B A B …) cancels host drift that poisons back-to-back bench runs. */
object GraphHintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_PROBE_REPEAT").map(_.toInt).getOrElse(5)
    val spark = graft.Engine.session(appName = "graft-graph-hint-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def loop(edges: DataFrame, hinted: Boolean): Long = {
      val e = graft.CacheScope.track(
        edges.select(col("query_id").cast("long").as("_s"),
          col("neighbor_id").cast("long").as("_d")).cache())
      val p = { // Graph.iterPartitions is private[operators] — same formula
        val sessionP = e.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        math.max(1, math.min(sessionP, ((e.count() + 1999999L) / 2000000L).toInt))
      }
      val withDeg = graft.CacheScope.track(
        e.join(e.groupBy("_s").agg(count(lit(1)).as("_deg")), "_s")
          .repartition(p, col("_s")).sortWithinPartitions("_s").cache())
      val nodes = graft.CacheScope.track(
        e.select(col("_s").as("_id")).union(e.select(col("_d").as("_id")))
          .distinct().repartition(p, col("_id")).sortWithinPartitions("_id").cache())
      withDeg.count(); nodes.count()
      graft.CacheScope.releaseEarly(e)
      val hint: DataFrame => DataFrame = if (hinted) broadcast(_) else identity
      var r = nodes.withColumn("_r", lit(1000000L)).localCheckpoint()
      for (_ <- 1 to 12) {
        val sums = withDeg
          .join(hint(r.withColumnRenamed("_id", "_s")), "_s")
          .select(col("_d"), expr("_r div _deg").as("_c"))
          .groupBy("_d").agg(sum(col("_c")).as("_S"))
        val next = nodes
          .join(hint(sums.withColumnRenamed("_d", "_id")), Seq("_id"), "left")
          .select(col("_id"),
            (lit(150000L) + expr("(85 * coalesce(_S, 0L)) div 100")).as("_r"))
          .localCheckpoint()
        graft.CacheScope.releaseLocalCheckpoint(r)
        r = next
      }
      graft.CacheScope.trackCheckpoint(r)
      val out = r.agg(sum(pmod(col("_r"), lit(1000000L)))).head().getLong(0)
      graft.CacheScope.release()
      out
    }

    def edges = graft.operators.Similarity.ivfKnnGraph(
      graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id")

    // warm both paths once
    loop(edges, hinted = false); loop(edges, hinted = true)
    val (as, bs) = (1 to reps).map { i =>
      val t0 = System.nanoTime(); val ca = loop(edges, hinted = false)
      val ta = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val cb = loop(edges, hinted = true)
      val tb = (System.nanoTime() - t1) / 1e9
      assert(ca == cb, s"variants disagree: $ca vs $cb")
      println(f"rep $i: smj $ta%6.3f s   bcast $tb%6.3f s")
      (ta, tb)
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.length - 1) / 2)
    println(f"MEDIANS  smj ${med(as)}%6.3f s   bcast ${med(bs)}%6.3f s")
    spark.stop()
  }
}
