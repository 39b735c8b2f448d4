package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-grain timing for the composition gates (VERDICT r13 item 4):
  * q100 (curation v3) and q177 (curation v7) crept across rounds
  * (q100: 4.78 s r7 → 6.79 r12 → 8.47 r13) while their plans were
  * unchanged — this tool attributes the creep by timing each composed
  * stage CUMULATIVELY (stage k's wall includes stages 1..k, exactly as
  * the composed plan evaluates them lazily; consecutive deltas attribute
  * the stage) with n repeats per stage, medians, and a fixed CPU anchor
  * probe before/after so a host-speed change cannot masquerade as a
  * stage regression. Results land in BASELINE.md's r14 movers table.
  */
object StageTimer {
  private def calibSec(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0, 256L << 20, 1, 32)
      .select(sum(pmod(xxhash64(col("id")), lit(1000000)))).head()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.get("SPARK_GRAFT_STAGE_REPEAT").map(_.toInt).getOrElse(5)
    val spark = graft.Engine.session(appName = "graft-stage-timer")
    spark.sparkContext.setLogLevel("ERROR")
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s((s.length - 1) / 2) }
    def time(tag: String)(f: => DataFrame): Double = {
      val walls = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try f.count() finally graft.CacheScope.release()
        (System.nanoTime() - t0) / 1e9
      }
      val m = median(walls)
      println(f"$tag%-46s ${m}%7.3f s  (n=$repeat: ${walls.map(w => f"$w%.2f").mkString(" ")})")
      m
    }
    // warm the tables + codegen once
    graft.Tables.All.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    calibSec(spark)
    println(f"anchor-cpu pre  ${math.min(calibSec(spark), calibSec(spark))}%.3f s")

    // ---- q100 curation v3, cumulative stages ----
    val v3Budgets = Seq("en" -> 3000L, "de" -> 1000L, "fr" -> 5000L, "zh" -> 800L)
    def q100Stripped = graft.operators.TextOps.stripRepeatedSpans(
        graft.queries.TextQueries.withBoiler(spark, sfDir), "doc_id", "text",
        span = 5, minDocs = 10)
      .select(col("doc_id"), col("clean_text").as("text"))
    def q100Scored = graft.operators.TextOps.ngramLmScore(q100Stripped,
      "doc_id", "text", alpha = 0.1, keepMaxMicroPerToken = 3400000L)
    def q100Kept = q100Scored.filter(col("keep"))
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "lang"), Seq("doc_id"))
    time("q100 s1 stripRepeatedSpans")(q100Stripped)
    time("q100 s2 +ngramLmScore")(q100Scored)
    time("q100 s3 +keep/lang join")(q100Kept)
    time("q100 s4 +tokenBudget+agg (full gate)")(
      graft.queries.TextQueries.q100CurationV3(spark, sfDir))

    // ---- q177 curation v7, cumulative stages ----
    def q177Cleaned = graft.operators.WebCuration.c4Clean(
        graft.queries.WebQueries.webAugment(graft.Tables.documents(spark, sfDir)),
        "doc_id", "text")
      .filter(col("doc_kept") === 1)
      .select(col("doc_id"), col("clean_text").as("text"))
    def q177Passed = graft.operators.WebCuration.gopherRules(
        q177Cleaned, "doc_id", "text", minWords = 10)
      .filter(col("pass") === 1).select("doc_id")
    def q177Survivors = q177Cleaned.join(q177Passed, Seq("doc_id"))
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "lang"), Seq("doc_id"))
    time("q177 s1 c4Clean")(q177Cleaned)
    time("q177 s2 +gopherRules")(q177Passed)
    time("q177 s3 +survivor joins")(q177Survivors)
    time("q177 s4 +perplexityBuckets (full gate)")(
      graft.queries.WebQueries.q177CurationV7(spark, sfDir))

    // ---- Bradley-Terry family, cumulative stages (VERDICT r14 item 2) ----
    // Where do q184/q188/q222/q191's seconds go: the duel self-join, the
    // pair collapse, the 6 MM rounds, the streaming complete-mode drain,
    // or the per-gate streaming session fixed cost?
    def duels = graft.queries.RankQueries.partDuelsForTiming(spark, sfDir)
    time("bt s1 partDuels self-join")(duels)
    time("bt s2 +canonical pair collapse")(
      duels.select(least(col("winner"), col("loser")).as("_i"),
          greatest(col("winner"), col("loser")).as("_j"))
        .groupBy("_i", "_j").agg(count(lit(1)).as("_n")))
    time("bt s3 full train (6 MM rounds)")(
      graft.operators.Rank.bradleyTerry(duels, "winner", "loser", rounds = 6))
    time("q191 full gate (+Spearman)")(
      graft.queries.RankQueries.q191LeaderboardAgreement(spark, sfDir))
    time("q188 full gate (stream drain)")(
      graft.queries.StreamingQueries.all("q188_stream_bradley_terry")(spark, sfDir))
    time("q222 full gate (spill partials)")(
      graft.queries.StreamingQueries.all("q222_stream_bt_bounded")(spark, sfDir))

    println(f"anchor-cpu post ${math.min(calibSec(spark), calibSec(spark))}%.3f s")
    spark.stop()
  }
}
