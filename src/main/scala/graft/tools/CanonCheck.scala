package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: are two structurally-identical plans over DIFFERENT
  * localCheckpoint RDDs canonically equal? If yes, Spark's CacheManager
  * (keyed by canonicalized plan) will share a cache entry between two
  * concurrent workers' per-round loop frames — the cross-talk suspect.
  */
object CanonCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("canon-check").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val a = Seq((1L, 10L), (2L, 20L)).toDF("_id", "_rep").localCheckpoint()
    val b = Seq((3L, 30L), (4L, 40L), (5L, 50L)).toDF("_id", "_rep").localCheckpoint()

    val ca = a.queryExecution.analyzed.canonicalized
    val cb = b.queryExecution.analyzed.canonicalized
    println(s"canonical equal (raw checkpoints): ${ca == cb}")
    println(s"sameResult: ${ca.sameResult(cb)}")

    // and with an identical projection on top (the loop-frame shape)
    val pa = a.select($"_id", $"_rep").filter($"_rep" > 0)
    val pb = b.select($"_id", $"_rep").filter($"_rep" > 0)
    println(s"canonical equal (projected): ${pa.queryExecution.analyzed.canonicalized == pb.queryExecution.analyzed.canonicalized}")

    // does the CacheManager share? cache a, then check lookup for b
    a.cache()
    a.count()
    val hit = spark.sharedState.cacheManager.lookupCachedData(
      b.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
    println(s"cacheManager cross-hit: ${hit.isDefined}")

    // scope-tag viability: does a withColumn(lit(id)).drop tag survive the
    // cache-manager's plan normalization, so two tags never share an entry
    // while the same tag still hits?
    def lookup(df: org.apache.spark.sql.DataFrame) =
      spark.sharedState.cacheManager.lookupCachedData(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isDefined
    def tagged(id: Long) = {
      val base = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      base.withColumn("__graft_scope", org.apache.spark.sql.functions.lit(id))
        .drop("__graft_scope")
        .select(base.columns.map(org.apache.spark.sql.functions.col): _*)
    }
    val t1 = tagged(1L)
    t1.cache(); t1.count()
    println(s"same-tag hit: ${lookup(tagged(1L))}")
    println(s"cross-tag hit (must be false): ${lookup(tagged(2L))}")
    println(s"untagged hit (must be false): ${lookup(spark.read.parquet("/root/testdata/sf0.001/region.parquet"))}")
    // and a filter-based tag as fallback candidate
    def ftagged(id: Long) = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .where(org.apache.spark.sql.functions.lit(id) === org.apache.spark.sql.functions.lit(id))
    val f1 = ftagged(10L)
    f1.cache(); f1.count()
    println(s"filter same-tag hit: ${lookup(ftagged(10L))}")
    println(s"filter cross-tag hit (must be false): ${lookup(ftagged(20L))}")
    spark.stop()
  }
}
