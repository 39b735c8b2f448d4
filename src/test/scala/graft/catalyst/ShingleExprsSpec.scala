package graft.catalyst

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class ShingleExprsSpec extends SparkSpec {
  import spark.implicits._

  test("shingle_hashes: sorted, distinct, count matches string shingles") {
    val df = Seq(
      "a b c d e",          // 3 distinct 3-shingles
      "x x x x",            // repeated tokens -> duplicate shingles collapse
      "one two",            // shorter than n -> empty
      "").toDF("text")
    val rows = df.select(
      ShingleExprs.shingleHashes(split(trim(col("text")), "\\s+"), 3).as("h"),
      size(Dedup.wordShingles(col("text"), 3)).as("nStr")).collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(hs == hs.sorted, "must be sorted")
      assert(hs.distinct.size == hs.size, "must be distinct")
      val nStr = if (r.isNullAt(1)) 0 else math.max(r.getInt(1), 0)
      assert(hs.size == nStr, s"hash-set size ${hs.size} != string-shingle size $nStr")
    }
  }

  test("minhash_sig: deterministic, length numPerms, equal sets -> equal sigs") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps", "totally different words here")
      .toDF("text")
      .select(ShingleExprs.minhashSig(
        ShingleExprs.shingleHashes(split(col("text"), " "), 2), 16).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.size == 16))
    assert(sigs(0) == sigs(1), "identical text -> identical signature")
    assert(sigs(0) != sigs(2), "different text -> different signature")
  }

  test("intersect_count_sorted agrees with array_intersect semantics") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 12L)),   // overlap 2
      (Seq(1L, 2L), Seq(3L, 4L)),                    // disjoint
      (Seq.empty[Long], Seq(1L)),                    // empty side
      (Seq(7L), Seq(7L)))                            // identical singleton
      .toDF("a", "b")
    val out = df.select(
      ShingleExprs.intersectCountSorted(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
