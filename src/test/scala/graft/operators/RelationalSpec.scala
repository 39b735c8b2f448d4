package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps exactly the max-ordered row per key") {
    val df = Seq(
      ("k1", 1L, "old"), ("k1", 3L, "new"), ("k1", 2L, "mid"),
      ("k2", 7L, "only")).toDF("k", "off", "v")
    val out = Relational.latestByKey(df, Seq("k"), Seq(col("off")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("k1", 3L, "new"), ("k2", 7L, "only")))
  }

  test("keepFirstBy keeps the min-ordered row per dup group") {
    val df = Seq((10L, "same"), (3L, "same"), (5L, "other")).toDF("id", "text")
    val out = Relational.keepFirstBy(df, Seq("text"), Seq(col("id")))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(3L, 5L))
  }

  test("topKPerGroup returns k rows per group in strict order") {
    val df = (1 to 20).map(i => (i % 2, i)).toDF("g", "x")
    val out = Relational.topKPerGroup(df, Seq(col("g")), Seq(col("x").desc), 3)
      .orderBy("g", "x").as[(Int, Int)].collect()
    assert(out.toSeq == Seq((0, 16), (0, 18), (0, 20), (1, 15), (1, 17), (1, 19)))
  }

  test("saltedEquiJoin returns exactly the plain-join result under skew") {
    val left = (1 to 5000).map(i => (if (i % 100 == 0) i.toLong else 7L, i))
      .toDF("k", "payload") // ~4950 rows share key 7 — one hot key
    val right = Seq((7L, "hot"), (100L, "cold"), (999L, "unmatched")).toDF("rk", "v")
    val plain = left.join(right, col("k") === col("rk")).count()
    val salted = Relational.saltedEquiJoin(left, right, "k", "rk", saltBuckets = 8)
    assert(salted.count() == plain)
    // the hot key's rows really are spread over multiple salt buckets
    val buckets = left
      .withColumn("_salt", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)))
      .filter(col("k") === 7L).select("_salt").distinct().count()
    assert(buckets > 1)
  }

  test("asofJoinBackward matches latest right at-or-before left time, per key") {
    val left = Seq(
      (1L, "2020-01-01 10:00:00", "e1"),
      (1L, "2020-01-01 12:00:00", "e2"),
      (2L, "2020-01-01 09:00:00", "e3")) // before any right row for key 2
      .toDF("k", "t", "ev")
      .withColumn("t", to_timestamp(col("t")))
    val right = Seq(
      (1L, "2020-01-01 09:30:00", 100),
      (1L, "2020-01-01 11:00:00", 200),
      (1L, "2020-01-01 12:00:00", 300), // equal ts: inclusive match
      (2L, "2020-01-01 23:00:00", 900))
      .toDF("k", "t", "val")
      .withColumn("t", to_timestamp(col("t")))
    val out = Relational.asofJoinBackward(left, right, "k", "k", "t", "t")
      .select(col("ev"), col("_asof.val").as("val"))
      .orderBy("ev")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(out.toSeq == Seq(("e1", 100), ("e2", 300), ("e3", -1)))
  }
}
