package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-asserted proofs for the physical-layout levers: a bucketed
  * co-located join must carry ZERO Exchange, and a partition-pruned scan
  * must show the predicate in `PartitionFilters` — the two write-time
  * decisions that delete shuffle and scan work at 100 TB. */
class LayoutSpec extends SparkSpec {

  test("bucketed co-located join: zero Exchange, same result as the plain join") {
    // broadcast disabled: otherwise the small fixture would broadcast and
    // trivially show no Exchange — the point is the SHUFFLE-free merge
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val a = s.range(0, 20000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = s.range(0, 20000).filter(col("id") % 3 === 0)
      .select(col("id").as("k"), (col("id") + 7).as("vb"))
    try {
      Layout.writeBucketed(a, "graft_bkt_a", s"$dir/a", "k", 8)
      Layout.writeBucketed(b, "graft_bkt_b", s"$dir/b", "k", 8)
      val bucketed = s.table("graft_bkt_a").join(s.table("graft_bkt_b"), "k")
      val p = bucketed.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-located join must not shuffle, got:\n$p")
      val plain = a.join(b, "k")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: the unbucketed join DOES shuffle (else this spec proves nothing)")
      // same rows, same aggregate — layout is a pure performance knob
      assert(bucketed.count() == plain.count())
      assert(bucketed.agg(sum(col("va") + col("vb"))).head.getLong(0) ==
        plain.agg(sum(col("va") + col("vb"))).head.getLong(0))
      // bucketed SHUFFLE-FREE aggregation on the bucket key, too
      val agg = s.table("graft_bkt_a").groupBy("k").agg(sum("va"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "keyed agg over the bucket key must reuse the bucketing, not shuffle")
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_bkt_a")
      s.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("partitioned table: predicate prunes at planning time (PartitionFilters)") {
    val s = spark.newSession()
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-p").toString
    val df = s.range(0, 1000).select(col("id"),
      (col("id") % 5).cast("string").as("lang"))
    try {
      Layout.writePartitioned(df, "graft_part_t", s"$dir/t", Seq("lang"))
      val q = s.table("graft_part_t").filter(col("lang") === "3")
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: [") && p.contains("lang"),
        s"lang predicate must prune partitions, got:\n$p")
      assert(q.count() == 200)
      // the pruned scan must NOT carry the predicate as a data filter on
      // file contents — it is resolved from directory names alone
      val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(scanLine.nonEmpty)
    } finally s.sql("DROP TABLE IF EXISTS graft_part_t")
  }
}
