package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Quantitative error bounds for the approximate family (q51-q54). The
  * correctness gate applies only a rows-only check to these (no cross-engine
  * oracle for approximations by design), so the accuracy contract is
  * enforced HERE: each sketch's published bound is asserted against the
  * exact answer on the same data — a quality regression (bad seed plumbing,
  * wrong accuracy knob, broken sketch merge) fails the suite, not just a
  * demo printout. ANN recall floors (q51 LSH / q53 IVF) are asserted in
  * SimilaritySpec; this spec covers the scalar sketches.
  */
class ApproxBoundsSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf)

  test("q52: approx_count_distinct error bounded at default and tightened rsd (gate sf0.01)") {
    // q52's shape at the correctness-gate SF. HLL++ is hash-based, so the
    // error on fixed data is deterministic — these are regression pins:
    // default rsd (0.05) stays within 3x rsd; an explicitly tightened
    // sketch (rsd 0.01) stays within 5% — i.e. the accuracy KNOB works.
    val gate = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val errs = gate.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("apx_p"),
        approx_count_distinct(col("l_partkey"), 0.01).as("apx_p_tight"),
        countDistinct(col("l_partkey")).as("ext_p"),
        approx_count_distinct(col("l_orderkey")).as("apx_o"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("apx_o_tight"),
        countDistinct(col("l_orderkey")).as("ext_o"))
      .select(col("l_returnflag"),
        (abs(col("apx_p") - col("ext_p")) / col("ext_p")).as("err_p"),
        (abs(col("apx_o") - col("ext_o")) / col("ext_o")).as("err_o"),
        (abs(col("apx_p_tight") - col("ext_p")) / col("ext_p")).as("terr_p"),
        (abs(col("apx_o_tight") - col("ext_o")) / col("ext_o")).as("terr_o"))
      .collect()
    assert(errs.nonEmpty)
    errs.foreach { r =>
      val g = r.getString(0)
      val (ep, eo, tp, to) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      info(f"group $g: default-rsd err partkey ${ep * 100}%.2f%% / orderkey ${eo * 100}%.2f%%; " +
        f"rsd=0.01 err ${tp * 100}%.2f%% / ${to * 100}%.2f%%")
      assert(ep <= 0.15 && eo <= 0.15,
        f"default-rsd approx_count_distinct off by ${math.max(ep, eo) * 100}%.2f%% in group $g")
      assert(tp <= 0.05 && to <= 0.05,
        f"rsd=0.01 approx_count_distinct off by ${math.max(tp, to) * 100}%.2f%% in group $g")
    }
  }

  test("q54: approx_percentile within rank-epsilon of the exact distribution") {
    // accuracy=1000 guarantees rank error <= 1/1000; assert against the
    // exact values at quantile +/- 0.005 (5x the published bound — failing
    // THIS means the sketch is broken, not unlucky).
    val eps = 0.005
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), array(lit(0.5), lit(0.95)), lit(1000)).as("apx"),
        percentile(col("l_extendedprice"),
          array(lit(0.5 - eps), lit(0.5 + eps), lit(0.95 - eps), lit(0.95 + eps))).as("ext"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getString(0)
      val apx = r.getSeq[Double](1)
      val ext = r.getSeq[Double](2)
      info(f"group $g: p50 ${apx(0)}%.2f in [${ext(0)}%.2f, ${ext(1)}%.2f], " +
        f"p95 ${apx(1)}%.2f in [${ext(2)}%.2f, ${ext(3)}%.2f]")
      assert(apx(0) >= ext(0) && apx(0) <= ext(1),
        f"p50 ${apx(0)}%.2f outside rank-eps window [${ext(0)}%.2f, ${ext(1)}%.2f] in group $g")
      assert(apx(1) >= ext(2) && apx(1) <= ext(3),
        f"p95 ${apx(1)}%.2f outside rank-eps window [${ext(2)}%.2f, ${ext(3)}%.2f] in group $g")
    }
  }

  test("q54: count-min sketch never undercounts and overshoots within eps*N") {
    // CMS(eps=0.01, conf=0.95): estimate >= true always (hash collisions
    // only ADD); overshoot <= eps*N per key with prob conf. Seeded, so the
    // outcome is deterministic — assert every key within the bound.
    val skBytes = li.agg(
      count_min_sketch(col("l_suppkey"), lit(0.01d), lit(0.95d), lit(42)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(skBytes))
    val truth = li.groupBy("l_suppkey").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = truth.map(_._2).sum
    assert(truth.nonEmpty)
    var worst = 0L
    truth.foreach { case (key, n) =>
      val est = cms.estimateCount(key)
      assert(est >= n, s"CMS undercounted suppkey $key: est $est < true $n — impossible unless broken")
      worst = math.max(worst, est - n)
      assert(est - n <= (0.01 * total).toLong.max(1L),
        s"CMS overshoot ${est - n} for suppkey $key exceeds eps*N = ${(0.01 * total).toLong}")
    }
    info(s"CMS over ${truth.length} keys, N=$total: worst overshoot $worst (bound ${(0.01 * total).toLong})")
  }
}
