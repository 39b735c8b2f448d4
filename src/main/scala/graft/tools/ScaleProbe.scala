package graft.tools

import graft.operators.{Dedup, Relational}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Cross-scale probe: run a plan at 1× and N× data (replicated with
  * DISTINCT keys, so per-key density stays constant — the honest
  * scale-up) and report wall times. The property that matters at 100 TB
  * is not the absolute number but the RATIO: a plan whose time scales
  * like its input (not its key-pair square) survives the scale-up.
  * Results are recorded in BASELINE.md's probe table per round.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session(appName = "graft-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    // --- interval join: replicate events with distinct users ------------
    val ev = graft.queries.RelationalQueries.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type")
    def evX(k: Int): DataFrame =
      (0 until k).map(i => ev.select(
        (col("user_id") + i * 10000000L).as("user_id"),
        (col("event_id") + i * 100000000L).as("event_id"),
        col("ts"), col("event_type"))).reduce(_ unionByName _)
    def intervalJoinCount(e: DataFrame): Long = {
      val a = e.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
      val b = e.select(col("user_id").as("uid_b"), col("event_id").as("id_b"), col("ts").as("ts_b"))
      Relational.intervalJoin(a, "ts_a", b, "ts_b",
        col("user_id") === col("uid_b") && col("id_a") =!= col("id_b"), "10 minutes").count()
    }
    time("interval join 1x (100k events)")(intervalJoinCount(evX(1)))
    time("interval join 10x (1M events, 10x users)")(intervalJoinCount(evX(10)))

    // --- connected components: star-clustered synthetic graph -----------
    def ccCount(nodes: Long): Long = {
      val edges = spark.range(nodes)
        .select(col("id").as("id_a"), (col("id") - col("id") % 10).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      Dedup.connectedComponents(edges, "id_a", "id_b").count()
    }
    time("connected components 1x (100k nodes)")(ccCount(100000L))
    time("connected components 10x (1M nodes)")(ccCount(1000000L))

    spark.stop()
  }
}
