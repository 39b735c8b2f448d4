package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.TimeUnit
import scala.collection.concurrent.TrieMap

/** Exact replica of ConcurrentGatesSpec's soak, run in a loop, dumping the
  * FULL divergent result + serial reference to /tmp on the first hit —
  * the diagnostic arm of the r12 root-cause hunt.
  */
object SoakRepro {
  private val inventory = Seq(
    "q01_scan_filter_project", "q04_agg_group", "q05_window_tumbling",
    "q08_join_star", "q10_latest_by_key", "q40_dedup_exact",
    "q41_dedup_minhash", "q45_dedup_clusters", "q70_weighted_mixture",
    "q92_lm_score", "q108_knn_graph", "q221_ivf_knn_graph",
    "q132_pagerank", "q212_class_report", "q217_fleiss_kappa",
    "q27_stream_tumbling", "q219_stream_fleiss_kappa")
  private val workers = 4

  def main(args: Array[String]): Unit = {
    val maxLoops = args.lift(0).map(_.toInt).getOrElse(6)
    if (!args.contains("--no-paranoid")) System.setProperty("graft.paranoid", "1")
    if (args.contains("--legacy")) System.setProperty("graft.cachescope.legacyRelease", "1")
    // The FULL pre-r12 window needs BOTH reverts: the thread-scope tag
    // alone defeats the legacy release window (r12 soak: tag+legacy arm
    // 10/10 green), so the red regression arm is `--legacy --notag`.
    if (args.contains("--notag")) System.setProperty("graft.notag", "1")
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-soak-repro")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("--cachelog"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.CacheManager",
        org.apache.logging.log4j.Level.DEBUG)

    def fingerprint(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.head, cols.tail: _*).collect().map(_.toString).toSeq.sorted
    }
    def runInventory(s: SparkSession, order: Seq[String]): Map[String, Seq[String]] =
      order.map { name =>
        val fp =
          try {
            val df = SparkEntry.queries(name)(s, sf)
            val first = fingerprint(df)
            if (first.isEmpty && name == "q45_dedup_clusters") {
              // in-flight forensics: does the SAME df stay empty on a second
              // collect (frozen corruption) and does a FRESH build recover?
              val second = fingerprint(df)
              val fresh = fingerprint(SparkEntry.queries(name)(s, sf))
              System.err.println(s"[soak-forensics] ${Thread.currentThread().getName}: " +
                s"$name EMPTY; same-df recollect=${second.size} rows, fresh rerun=${fresh.size} rows")
            }
            first
          } finally graft.CacheScope.release()
        name -> fp
      }.toMap

    val reference = runInventory(spark, inventory)
    println(s"reference sizes: ${inventory.map(n => s"$n=${reference(n).size}").mkString(", ")}")

    var loop = 0
    var found = false
    while (loop < maxLoops && !found) {
      loop += 1
      Seq("shared", "newSession").foreach { mode =>
        if (!found) {
          val results = TrieMap[Int, Map[String, Seq[String]]]()
          val failures = TrieMap[Int, Throwable]()
          val threads = (0 until workers).map { w =>
            val t = new Thread(() => {
              try {
                val rotated = inventory.drop(w * 4 % inventory.size) ++
                  inventory.take(w * 4 % inventory.size)
                // --sharedscope: all workers adopt ONE cache scope (the
                // r13 opt-in same-tenant mode) — correctness must then
                // ride the atomic refcounted release alone.
                if (args.contains("--sharedscope")) graft.Tables.enterSharedScope(77L)
                val s = if (mode == "shared") spark else spark.newSession()
                try results(w) = runInventory(s, rotated)
                finally graft.Tables.exitSharedScope() // no-op outside a scope
              } catch { case e: Throwable => failures(w) = e }
            }, s"soak-$mode-$loop-$w")
            t.start(); t
          }
          threads.foreach(_.join(TimeUnit.MINUTES.toMillis(20)))
          failures.foreach { case (w, e) =>
            println(s"loop $loop $mode worker $w THREW: $e")
            e.printStackTrace()
            found = true
          }
          (0 until workers).foreach { w =>
            results.get(w).foreach { got =>
              inventory.foreach { name =>
                if (got(name) != reference(name)) {
                  found = true
                  println(s"loop $loop $mode worker $w DIVERGED on $name: got ${got(name).size} rows, ref ${reference(name).size}")
                  val dir = java.nio.file.Paths.get("/tmp/soak_repro")
                  java.nio.file.Files.createDirectories(dir)
                  java.nio.file.Files.write(dir.resolve(s"got_${name}_w$w.txt"),
                    got(name).mkString("\n").getBytes)
                  java.nio.file.Files.write(dir.resolve(s"ref_${name}.txt"),
                    reference(name).mkString("\n").getBytes)
                }
              }
            }
          }
          println(s"loop $loop $mode done (found=$found)")
        }
      }
    }
    spark.stop()
    if (found) sys.exit(1)
  }
}
