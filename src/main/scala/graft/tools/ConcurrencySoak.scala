package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Full-inventory concurrency soak — the BASELINE.md evidence arm of the
  * multi-tenant story (the CI arm is `ConcurrentGatesSpec`): run EVERY
  * gate in the inventory across N concurrent workers against one
  * SparkContext, under either session-sharing model, and hash-compare
  * every worker's every result against a serial reference pass.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_SOAK_SESSIONS=4]
  *   [SPARK_GRAFT_SOAK_MODE=shared|child] sbt "runMain graft.tools.ConcurrencySoak"
  *
  * Prints one JSON line:
  *   {"mode":…, "sessions":N, "gates":G, "serial_sec":…, "soak_sec":…,
  *    "per_session_sec":[…], "skew":maxSession/minSession,
  *    "mismatches":[…], "errors":[…]}
  *
  * Workers run rotated gate orders so different families genuinely
  * overlap; each worker releases its own CacheScope references per gate
  * (the thread-scoped + refcounted contract this soak exists to
  * exercise). Fingerprints sort columns by name and rows by value — the
  * same canonicalization as the DuckDB oracle compare, minus the oracle.
  */
object ConcurrencySoak {

  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    s"${rows.length}:${md.digest().map("%02x".format(_)).mkString}"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sessions = sys.env.get("SPARK_GRAFT_SOAK_SESSIONS").map(_.toInt).getOrElse(4)
    val mode = sys.env.getOrElse("SPARK_GRAFT_SOAK_MODE", "child")
    val spark = graft.Engine.session(appName = "graft-soak")
    spark.sparkContext.setLogLevel("ERROR")
    val gates = SparkEntry.queries.keys.toSeq.sorted

    def runInventory(s: SparkSession, order: Seq[String],
        sink: (String, String) => Unit): Unit =
      order.foreach { name =>
        val fp = try fingerprint(SparkEntry.queries(name)(s, sfDir))
          finally graft.CacheScope.release()
        sink(name, fp)
      }

    val reference = TrieMap[String, String]()
    val t0 = System.nanoTime()
    runInventory(spark, gates, (n, f) => reference(n) = f)
    val serialSec = (System.nanoTime() - t0) / 1e9

    val results = TrieMap[Int, TrieMap[String, String]]()
    val walls = TrieMap[Int, Double]()
    val errors = TrieMap[Int, String]()
    val t1 = System.nanoTime()
    val threads = (0 until sessions).map { w =>
      val t = new Thread(() => {
        // sharedscope: the OPT-IN same-tenant mode (r12 verdict item 5) —
        // workers adopt one cache scope id, so operator-internal persists
        // dedupe into shared CacheManager entries again (cross-worker
        // reuse); correctness then rides CacheScope's atomic refcounted
        // release. Runs on child sessions (the service shape).
        val s = if (mode == "shared") spark else spark.newSession()
        if (mode == "sharedscope") graft.Tables.enterSharedScope(424242L)
        val mine = TrieMap[String, String]()
        results(w) = mine
        val w0 = System.nanoTime()
        try runInventory(s, gates.drop(w * 57 % gates.size) ++
            gates.take(w * 57 % gates.size), (n, f) => mine(n) = f)
        catch { case e: Throwable =>
          errors(w) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}" }
        finally {
          walls(w) = (System.nanoTime() - w0) / 1e9
          graft.Tables.exitSharedScope() // drains deferred unpersists (last member)
        }
      }, s"soak-$w")
      t.start(); t
    }
    threads.foreach(_.join())
    val soakSec = (System.nanoTime() - t1) / 1e9

    val mismatches = (0 until sessions).flatMap { w =>
      gates.flatMap { g =>
        results(w).get(g) match {
          case Some(f) if f == reference(g) => None
          case Some(_) => Some(s"$w/$g:diverged")
          case None if errors.contains(w) => None // worker died, reported there
          case None => Some(s"$w/$g:missing")
        }
      }
    }
    val perSession = (0 until sessions).map(w => walls.getOrElse(w, -1.0))
    val skew = if (perSession.forall(_ > 0)) perSession.max / perSession.min else -1.0
    println(
      s"""{"mode":"$mode","sessions":$sessions,"gates":${gates.size},""" +
      f""""serial_sec":$serialSec%.1f,"soak_sec":$soakSec%.1f,""" +
      s""""per_session_sec":[${perSession.map(v => f"$v%.1f").mkString(",")}],""" +
      f""""skew":$skew%.2f,""" +
      s""""mismatches":[${mismatches.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""errors":[${errors.toSeq.sortBy(_._1).map(e => "\"" + e._1 + ":" + e._2 + "\"").mkString(",")}]}""")
    spark.stop()
    if (mismatches.nonEmpty || errors.nonEmpty) sys.exit(1)
  }
}
