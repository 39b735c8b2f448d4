package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, String)], l: Int, c: Int) =
    Privacy.lDiversityAudit(rows.toDF("q", "v"), Seq("q"), "v", l, c)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getBoolean(6))).toMap

  // ---- lDiversityAudit ------------------------------------------------

  test("lDiversityAudit: hand-computed class verdicts") {
    // class A: counts desc [3,1,1]; class B: constant value
    val rows = Seq("A" -> "x", "A" -> "x", "A" -> "x", "A" -> "y", "A" -> "z",
      "B" -> "w", "B" -> "w", "B" -> "w")
    val r2 = audit(rows, l = 2, c = 2)
    // A: n=5, distinct=3, top=3, tail(r2..)=2; 3 >= 2 ok; 3 < 2*2 ok
    assert(r2("A") == ((5L, 3L, 3L, 2L, true, true)))
    // B: distinct=1 fails both (tail = 0 kills recursive automatically)
    assert(r2("B") == ((3L, 1L, 3L, 0L, false, false)))
    val r3 = audit(rows, l = 3, c = 1)
    // A: distinct 3 >= 3 ok; recursive: tail(r3..)=1, 3 < 1*1 FAILS
    assert(r3("A") == ((5L, 3L, 3L, 1L, true, false)))
  }

  test("lDiversityAudit: NULL sensitive rows are excluded, not a diversity value") {
    val rows = Seq(("A", "x"), ("A", null), ("A", "y"), ("A", null))
    val r = Privacy.lDiversityAudit(rows.toDF("q", "v"), Seq("q"), "v", 2, 1)
      .collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L) // n=2, distinct=2
  }

  test("lDiversityAudit: deterministic under input row order") {
    val rows = (1 to 500).map(i =>
      (s"c${i * 48271 % 7}", s"v${i * 2654435761L % 13}"))
    val a = audit(rows, 4, 2)
    val b = audit(scala.util.Random.shuffle(rows), 4, 2)
    assert(a == b)
  }

  // ---- tCloseness -----------------------------------------------------

  private def tc(rows: Seq[(String, Long)]) =
    Privacy.tCloseness(rows.toDF("q", "v"), Seq("q"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("tCloseness: classes mirroring the global distribution score 0") {
    val rows = Seq("A" -> 1L, "A" -> 2L, "B" -> 1L, "B" -> 2L)
    assert(tc(rows) == Map("A" -> 0L, "B" -> 0L))
  }

  test("tCloseness: fully polarized two-value split scores 1/2 each side") {
    // global = (1/2, 1/2); class A all on value 1: |p1-q1| = 1/2, m-1 = 1
    val rows = Seq("A" -> 1L, "A" -> 1L, "B" -> 2L, "B" -> 2L)
    assert(tc(rows) == Map("A" -> 500000L, "B" -> 500000L))
  }

  test("tCloseness: ordered metric — far mass costs more than near mass") {
    // global over {1,2,3}: A sits on 1, B on 2, C on 3 (each 2 rows)
    // EMD(A) = (|1-1/3| + |1-2/3|)/2 = 1/2; EMD(B) = (1/3 + 1/3... ) =
    //   (|0-1/3| + |1-2/3|)/2 = 1/3; centered class is CLOSER — ordered
    //   distance, not variational
    val rows = Seq("A" -> 1L, "A" -> 1L, "B" -> 2L, "B" -> 2L, "C" -> 3L, "C" -> 3L)
    val r = tc(rows)
    assert(r("A") == 500000L && r("C") == 500000L)
    assert(r("B") == 333333L)
  }

  test("tCloseness: single-value universe reports 0 by convention") {
    val rows = Seq("A" -> 5L, "B" -> 5L, "B" -> 5L)
    assert(tc(rows) == Map("A" -> 0L, "B" -> 0L))
  }

  test("tCloseness: matches a local exact-EMD computation on hashed data") {
    val rows = (1 to 600).map(i =>
      (s"c${i * 48271 % 5}", (i * 2654435761L % 9).toLong))
    val local: Map[String, Long] = {
      val byCv = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val global = rows.groupBy(_._2).map { case (v, r) => v -> r.size.toLong }
      val values = global.keys.toSeq.sorted
      val bigN = BigInt(rows.size)
      val m = BigInt(values.size)
      rows.groupBy(_._1).map { case (cls, r) =>
        val nc = BigInt(r.size)
        var pre = BigInt(0); var num = BigInt(0)
        for (v <- values) {
          pre += BigInt(byCv.getOrElse((cls, v), 0L)) * bigN - BigInt(global(v)) * nc
          num += pre.abs
        }
        cls -> ((BigInt(1000000) * num) / ((m - 1) * nc * bigN)).toLong
      }
    }
    assert(tc(rows) == local)
  }

  test("tCloseness: NULL sensitive rows carry no mass") {
    val rows = Seq(("A", java.lang.Long.valueOf(1L)), ("A", null),
      ("B", java.lang.Long.valueOf(2L)))
    val r = Privacy.tCloseness(rows.toDF("q", "v"), Seq("q"), "v")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    // global = {1: 1, 2: 1}; A has n=1 on value 1 -> t = 1/2
    assert(r("A") == ((1L, 500000L)) && r("B") == ((1L, 500000L)))
  }
}
