package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  // ---- rocAuc ---------------------------------------------------------

  test("rocAuc: perfect separation is 1e6, reversed is 0, balanced ties are 500000") {
    val perfect = Seq((1, false), (2, false), (3, true), (4, true)).toDF("s", "y")
    assert(Metrics.rocAuc(perfect, "s", "y").collect()(0).getLong(2) == 1000000L)
    val reversed = Seq((1, true), (2, true), (3, false), (4, false)).toDF("s", "y")
    assert(Metrics.rocAuc(reversed, "s", "y").collect()(0).getLong(2) == 0L)
    // every score tied: midranks make AUC exactly 1/2
    val tied = Seq((7, true), (7, false), (7, true), (7, false)).toDF("s", "y")
    assert(Metrics.rocAuc(tied, "s", "y").collect()(0).getLong(2) == 500000L)
  }

  test("rocAuc: matches the brute-force pair count on tie-heavy data") {
    // AUC = (#(s+ > s-) + 0.5 * #(s+ = s-)) / (n+ * n-)
    val rows = (1 to 400).map { i =>
      (i * 2654435761L % 17, i * 40503L % 7 < 3)
    }
    val local = {
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      1000000L * wins / (2L * pos.size * neg.size) // floor, matches fdiv
    }
    val got = Metrics.rocAuc(rows.toDF("s", "y"), "s", "y").collect()(0)
    assert(got.getLong(2) == local, s"engine ${got.getLong(2)} vs brute $local")
    assert(got.getLong(0) == rows.count(_._2) && got.getLong(1) == rows.count(!_._2))
  }

  test("rocAuc: one-class input reports NULL; null scores excluded, null label = negative") {
    val oneClass = Seq((1, true), (2, true)).toDF("s", "y")
    assert(Metrics.rocAuc(oneClass, "s", "y").collect()(0).isNullAt(2))
    val withNulls = Seq[(java.lang.Integer, java.lang.Boolean)](
      (1, true), (null, true), (2, null), (3, true)).toDF("s", "y")
    val r = Metrics.rocAuc(withNulls, "s", "y").collect()(0)
    // null score dropped; null label counts negative: pos {1,3}, neg {2}
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 500000L) // pairs: (1<2)=0, (3>2)=1 -> 1/2
  }

  test("rocAuc: invariant under input row order") {
    val rows = (1 to 300).map(i => (i * 48271 % 23, i % 5 == 0)).toDF("s", "y")
    val a = Metrics.rocAuc(rows, "s", "y").collect()(0).getLong(2)
    val b = Metrics.rocAuc(rows.orderBy(rand(7)), "s", "y").collect()(0).getLong(2)
    assert(a == b)
  }

  // ---- ksTwoSample ----------------------------------------------------

  test("ksTwoSample: identical samples give D = 0; disjoint ranges give D = 1e6") {
    val same = Seq((1, true), (2, true), (3, true), (1, false), (2, false), (3, false))
      .toDF("v", "a")
    val r0 = Metrics.ksTwoSample(same, "v", "a").collect()(0)
    assert(r0.getLong(2) == 0L)
    val disjoint = Seq((1, true), (2, true), (10, false), (11, false)).toDF("v", "a")
    val r1 = Metrics.ksTwoSample(disjoint, "v", "a").collect()(0)
    assert(r1.getLong(2) == 1000000L)
    assert(r1.getInt(3) == 2) // sup attained at A's last value
  }

  test("ksTwoSample: matches the local ECDF sweep on skewed data") {
    val rows = (1 to 500).map { i =>
      val side = i % 3 == 0
      val v = if (side) (i * 7 % 40) else (i * 11 % 50)
      (v, side)
    }
    val (as, bs) = (rows.filter(_._2).map(_._1), rows.filterNot(_._2).map(_._1))
    val localD = {
      val vs = rows.map(_._1).distinct.sorted
      vs.map { v =>
        val fa = as.count(_ <= v).toLong * bs.size
        val fb = bs.count(_ <= v).toLong * as.size
        math.abs(fa - fb)
      }.max
    }
    val expect = 1000000L * localD / (as.size.toLong * bs.size)
    val got = Metrics.ksTwoSample(rows.toDF("v", "a"), "v", "a").collect()(0)
    assert(got.getLong(2) == expect, s"engine ${got.getLong(2)} vs local $expect")
    graft.CacheScope.release()
  }

  test("ksFromCounts: pre-aggregated counts equal the exploded samples (weighted-form law)") {
    val rows = (1 to 300).map(i => (i * 13 % 25, i % 4 == 0))
    val exploded = Metrics.ksTwoSample(rows.toDF("v", "a"), "v", "a")
      .collect()(0)
    graft.CacheScope.release()
    val counts = rows.groupBy(_._1).map { case (v, g) =>
      (v, g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toSeq.toDF("v", "ca", "cb")
    val agg = Metrics.ksFromCounts(counts, "v", "ca", "cb").collect()(0)
    graft.CacheScope.release()
    assert(exploded.getLong(2) == agg.getLong(2) && exploded.getInt(3) == agg.getInt(3))
  }

  test("ksTwoSample: empty side reports NULL d_micro") {
    val oneSide = Seq((1, true), (2, true)).toDF("v", "a")
    val r = Metrics.ksTwoSample(oneSide, "v", "a").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
    graft.CacheScope.release()
  }

  // ---- cohenKappa -----------------------------------------------------

  test("cohenKappa: hand-computed 2x2 case is exact") {
    // confusion: yes/yes 20, yes/no 5, no/yes 10, no/no 15 -> n=50
    // po = 35/50; pe = (25*30 + 25*20)/2500 = 1250/2500
    // kappa = (50*35 - 1250)/(2500 - 1250) = 500/1250 = 0.4 exactly
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Metrics.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(r.getLong(2) == 700000L && r.getLong(3) == 400000L)
    graft.CacheScope.release()
  }

  test("cohenKappa: worse-than-chance disagreement goes negative (floor like DuckDB //)") {
    // raters always disagree on a balanced binary task: po=0, pe=1/2 -> kappa=-1
    val rows = Seq(("y", "n"), ("n", "y"), ("y", "n"), ("n", "y"))
    val r = Metrics.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(3) == -1000000L)
    graft.CacheScope.release()
  }

  test("cohenKappa: single shared category hits the pe=1 convention; nulls excluded") {
    val rows = Seq(("x", "x"), ("x", "x"), ("x", "x"))
    val r = Metrics.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(3) == 1000000L, "Cauchy-Schwarz equality -> perfect agreement")
    graft.CacheScope.release()
    val withNull = Seq(("y", "y"), (null, "y"), ("n", null), ("n", "n"))
      .toDF("a", "b")
    val r2 = Metrics.cohenKappa(withNull, "a", "b").collect()(0)
    assert(r2.getLong(0) == 2L && r2.getLong(1) == 2L)
    graft.CacheScope.release()
  }

  // ---- retrievalMetrics -----------------------------------------------

  test("retrievalMetrics: hand case — every metric to the micro-unit") {
    // one query, 4 results ranked by score desc: gains (0, 2, 0, 1), k=3
    val rows = Seq(("q", "d1", 40, 0L), ("q", "d2", 30, 2L),
      ("q", "d3", 20, 0L), ("q", "d4", 10, 1L)).toDF("q", "d", "score", "rel")
    val r = Metrics.retrievalMetrics(rows, "q", "rel",
      Seq(col("score").desc, col("d")), k = 3).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L) // n_results, n_rel
    assert(r.getLong(3) == 500000L) // first relevant at rank 2
    // dcg@3 = round(1e6*2/log2(3)) = 1261860 (rank-3 gain 0, rank-4 cut)
    val d2 = math.round(1e6 * 2.0 / Metrics.discount(2))
    assert(r.getLong(4) == d2, s"dcg ${r.getLong(4)} vs $d2")
    // ideal order: gains (2, 1, 0, 0) -> idcg = round(2e6/log2(2)) + round(1e6/log2(3))
    val ideal = math.round(1e6 * 2.0 / Metrics.discount(1)) +
      math.round(1e6 * 1.0 / Metrics.discount(2))
    assert(r.getLong(5) == ideal)
    assert(r.getLong(6) == 1000000L * d2 / ideal) // ndcg floor
    assert(r.getLong(7) == 333333L) // 1 hit in top-3
    assert(r.getLong(8) == 500000L) // 1 of 2 relevant inside k
  }

  test("retrievalMetrics: no relevant result -> mrr 0, ndcg 0, recall NULL") {
    val rows = Seq(("q", 1, 0L), ("q", 2, 0L)).toDF("q", "score", "rel")
    val r = Metrics.retrievalMetrics(rows, "q", "rel",
      Seq(col("score").desc), k = 2).collect()(0)
    assert(r.getLong(3) == 0L && r.getLong(6) == 0L && r.isNullAt(8))
  }

  test("retrievalMetrics: negative or NULL relevance fails loudly") {
    val bad = Seq(("q", 1, -1L)).toDF("q", "score", "rel")
    val e = intercept[Exception] {
      Metrics.retrievalMetrics(bad, "q", "rel", Seq(col("score").desc), k = 1)
        .collect()
    }
    assert(e.getMessage.contains("retrievalMetrics") ||
      e.getCause != null && e.getCause.getMessage.contains("retrievalMetrics"))
  }

  test("retrievalMetrics: per-query isolation — metrics never cross queries") {
    val rows = Seq(("a", 2, 1L), ("a", 1, 0L), ("b", 2, 0L), ("b", 1, 1L))
      .toDF("q", "score", "rel")
    val m = Metrics.retrievalMetrics(rows, "q", "rel",
      Seq(col("score").desc), k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m("a") == 1000000L, "a's relevant doc ranks first")
    assert(m("b") == 500000L, "b's relevant doc ranks second")
  }

  test("discount literals round-trip through the SQL repr") {
    for (i <- 1 to 64) {
      val lit = Metrics.discountSqlLiteral(i)
      val d = lit.stripPrefix("CAST(").takeWhile(_ != ' ').toDouble
      assert(java.lang.Double.compare(d, Metrics.discount(i)) == 0, s"i=$i")
    }
  }

  // ---- chiSquareIndependence ------------------------------------------

  private def chi(rows: Seq[(String, String)]) =
    Metrics.chiSquareIndependence(rows.toDF("a", "b"), "a", "b").collect()(0)

  test("chiSquare: exact independence is 0, perfect association is n with V2 = 1") {
    // uniform 2x2: every o equals its expectation
    val indep = for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5)
      yield (a, b)
    val ri = chi(indep)
    assert(ri.getLong(2) == 0L && ri.getLong(3) == 0L && ri.getLong(1) == 1L)
    // diagonal 2x2: chi2 = n, V2 = 1
    val diag = Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))
    val rd = chi(diag)
    assert(rd.getLong(2) == 20L * 1000000L, "chi2 = n on a perfect diagonal")
    assert(rd.getLong(3) == 1000000L, "Cramer's V2 = 1")
  }

  test("chiSquare: matches the local split-division brute force on hashed data") {
    val rows = (1 to 700).map(i =>
      (s"a${i * 48271 % 5}", s"b${(i * 2654435761L + i * i) % 4}"))
    val local: (Long, Long, Long, Long) = {
      val cm = rows.groupBy(identity).map { case (k, v) => k -> BigInt(v.size) }
      val as = rows.map(_._1).distinct.sorted
      val bs = rows.map(_._2).distinct.sorted
      val ra = as.map(a => a -> cm.collect { case ((x, _), n) if x == a => n }.sum).toMap
      val cb = bs.map(b => b -> cm.collect { case ((_, y), n) if y == b => n }.sum).toMap
      val n = BigInt(rows.size)
      var chi2 = BigInt(0)
      for (a <- as; b <- bs) {
        val d = cm.getOrElse((a, b), BigInt(0)) * n - ra(a) * cb(b)
        val nrc = n * ra(a) * cb(b)
        chi2 += BigInt(1000000) * ((d * d) / nrc) + (BigInt(1000000) * ((d * d) % nrc)) / nrc
      }
      val dof = (as.size - 1L) * (bs.size - 1L)
      val v2 = chi2 / (n * (math.min(as.size, bs.size) - 1))
      (n.toLong, dof, chi2.toLong, v2.toLong)
    }
    val r = chi(rows)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == local)
  }

  test("chiSquare: constant column means dof 0 and NULL statistic; NULLs excluded") {
    val const = Seq(("x", "p"), ("x", "q"), ("x", "p"))
    val r = chi(const)
    assert(r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3))
    val withNulls = Seq[(String, String)](("x", "p"), (null, "q"), ("y", null),
      ("y", "q"), ("x", "p"), ("y", "q"))
    assert(chi(withNulls).getLong(0) == 4L, "null-side rows carry no cell")
  }

  test("chiSquareFromCounts: weighted form equals the exploded rows") {
    val rows = (1 to 300).map(i => (s"a${i % 3}", s"b${i * 7 % 5}"))
    val exploded = chi(rows)
    val counts = rows.groupBy(identity).toSeq
      .map { case ((a, b), v) => (a, b, v.size.toLong) }
      .toDF("a", "b", "n")
    val weighted = Metrics.chiSquareFromCounts(counts, "a", "b", "n").collect()(0)
    assert(exploded.toSeq == weighted.toSeq)
  }

  test("chiSquare: invariant under input row order") {
    val rows = (1 to 400).map(i => (s"a${i * 31 % 4}", s"b${i * 17 % 6}"))
    val a = chi(rows)
    val b = chi(scala.util.Random.shuffle(rows))
    assert(a.toSeq == b.toSeq)
  }

  // ---- averagePrecision ---------------------------------------------------

  test("averagePrecision: perfect separation is 1e6 with divisible blocks; tie block steps") {
    val perfect = Seq((4, true), (3, true), (2, false), (1, false)).toDF("s", "y")
    assert(Metrics.averagePrecision(perfect, "s", "y").collect()(0).getLong(2)
      == 1000000L)
    // one tied block, 1 of 2 positive: AP = (1/1)*(1/2)
    val tied = Seq((7, true), (7, false)).toDF("s", "y")
    assert(Metrics.averagePrecision(tied, "s", "y").collect()(0).getLong(2)
      == 500000L)
  }

  test("averagePrecision: matches the local block formula on hashed data") {
    val rows = (1 to 400).map(i => (i * 2654435761L % 19, i * 40503L % 5 < 2))
    val local: Long = {
      val blocks = rows.groupBy(_._1).toSeq.sortBy(-_._1).map { case (_, r) =>
        (BigInt(r.size), BigInt(r.count(_._2))) }
      val npos = blocks.map(_._2).sum
      var cn = BigInt(0); var cp = BigInt(0); var ap = BigInt(0)
      for ((c, p) <- blocks) {
        cn += c; cp += p
        if (p > 0) ap += (BigInt(1000000) * p * cp) / (npos * cn)
      }
      ap.toLong
    }
    val r = Metrics.averagePrecision(rows.toDF("s", "y"), "s", "y").collect()(0)
    assert(r.getLong(2) == local, s"engine ${r.getLong(2)} vs brute $local")
  }

  test("averagePrecision: no positives reports NULL; null handling matches rocAuc") {
    val onlyNeg = Seq((1, false), (2, false)).toDF("s", "y")
    assert(Metrics.averagePrecision(onlyNeg, "s", "y").collect()(0).isNullAt(2))
    val withNulls = Seq[(java.lang.Integer, java.lang.Boolean)](
      (3, true), (null, true), (2, null), (1, true)).toDF("s", "y")
    val r = Metrics.averagePrecision(withNulls, "s", "y").collect()(0)
    // null score dropped, null label negative: pos {3,1}, neg {2}
    // blocks desc: (3,T) term 1e6*1*1/(2*1); (1,T) term 1e6*1*2/(2*3)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 500000L + 333333L)
  }

  // ---- gainsTable ------------------------------------------------------------

  test("gainsTable: perfect ranking captures everything in the top band") {
    // 20 rows, top 2 scores are the only positives, 10 bands of 2
    val rows = (1 to 20).map(i => (21 - i, i <= 2)).toDF("s", "y")
    val r = Metrics.gainsTable(rows, "s", "y", buckets = 10).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(2) == 2L, "both positives in band 0")
    assert(r(0L).getLong(5) == 1000000L, "gain 100% immediately")
    assert(r(0L).getLong(6) == 10000000L, "lift 10x at the top decile")
    assert(r(9L).getLong(6) == 1000000L, "lift decays to 1 at full depth")
    graft.CacheScope.release()
  }

  test("gainsTable: tie blocks never split — block lands in its last row's band") {
    // one score block of 6 rows over 2 bands of 5: block end = row 6 ->
    // band 1; band 0 is EMPTY (absent), not fabricated
    val rows = (Seq.fill(6)((5, true)) ++ Seq.fill(4)((1, false))).toDF("s", "y")
    val r = Metrics.gainsTable(rows, "s", "y", buckets = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 10L), s"tie block must land whole in band 1, got $r")
    graft.CacheScope.release()
  }

  test("gainsTable: matches the local exact computation on hashed data") {
    val rows = (1 to 300).map(i => (i * 2654435761L % 37, i * 40503L % 4 == 0))
    val local = {
      val blocks = rows.groupBy(_._1).toSeq.sortBy(-_._1).map { case (_, r) =>
        (r.size.toLong, r.count(_._2).toLong) }
      val bigN = rows.size.toLong; val bigP = blocks.map(_._2).sum
      var cn = 0L
      val bands = blocks.map { case (c, p) =>
        cn += c; (((cn - 1) * 10) / bigN, c, p) }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, r) => (b, r.map(_._2).sum, r.map(_._3).sum) }
      var cumN = 0L; var cumP = 0L
      bands.map { case (b, n, p) =>
        cumN += n; cumP += p
        (b, n, p, cumN, cumP,
          BigInt(1000000) * cumP / bigP,
          BigInt(1000000) * cumP * bigN / (BigInt(cumN) * bigP))
      }.map(t => (t._1, t._2, t._3, t._4, t._5, t._6.toLong, t._7.toLong))
    }
    val got = Metrics.gainsTable(rows.toDF("s", "y"), "s", "y", 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).sortBy(_._1)
    assert(got.toSeq == local)
    graft.CacheScope.release()
  }

  // ---- probScorecard -------------------------------------------------------

  test("probScorecard: the perfect forecast scores 0 on both; constant half is exact") {
    val perfect = Seq((1000000L, true), (0L, false), (1000000L, true))
      .toDF("p", "y")
    val rp = Metrics.probScorecard(perfect, "p", "y").collect()(0)
    assert(rp.getLong(2) == 0L && rp.getLong(3) == 0L)
    // constant 0.5 on a balanced sample: Brier = 0.25, ECE = 0
    val half = Seq((500000L, true), (500000L, false)).toDF("p", "y")
    val rh = Metrics.probScorecard(half, "p", "y").collect()(0)
    assert(rh.getLong(2) == 250000L && rh.getLong(3) == 0L)
    // same constant on an ALL-positive sample: ECE = 0.5 exactly
    val off = Seq((500000L, true), (500000L, true)).toDF("p", "y")
    assert(Metrics.probScorecard(off, "p", "y").collect()(0).getLong(3)
      == 500000L)
  }

  test("probScorecard: matches the local exact rational on hashed forecasts") {
    val rows = (1 to 500).map { i =>
      val p = (i * 2654435761L % 1000001L)
      (p, (i * 48271 % 100) < p / 10000)
    }
    val local: (Long, Long) = {
      val n = BigInt(rows.size)
      val sq = rows.map { case (p, y) =>
        val d = BigInt(p) - (if (y) 1000000 else 0); d * d }.sum
      val gap = rows.groupBy { case (p, _) =>
        math.min(p * 10 / 1000000, 9) }.values.map { r =>
        (r.map(x => BigInt(x._1)).sum -
          BigInt(1000000) * r.count(_._2)).abs }.sum
      ((sq / (BigInt(1000000) * n)).toLong, (gap / n).toLong)
    }
    val r = Metrics.probScorecard(rows.toDF("p", "y"), "p", "y").collect()(0)
    assert((r.getLong(2), r.getLong(3)) == local)
  }

  test("probScorecard: out-of-range probability fails loudly") {
    intercept[Exception] {
      Metrics.probScorecard(Seq((1000001L, true)).toDF("p", "y"), "p", "y")
        .collect()
    }
    graft.CacheScope.release()
  }

  // ---- fairnessReport -------------------------------------------------------

  test("fairnessReport: hand-computed group rates and gaps") {
    // group A: y/pred (1,1),(1,0),(0,1),(0,0); group B: (1,1)x2,(0,0)x2
    val rows = Seq(
      ("A", true, true), ("A", true, false), ("A", false, true), ("A", false, false),
      ("B", true, true), ("B", true, true), ("B", false, false), ("B", false, false))
      .toDF("g", "y", "p")
    val r = Metrics.fairnessReport(rows, "g", "y", "p").collect()
      .map(x => x.getString(0) -> x).toMap
    // A: sel 1/2, tpr 1/2, fpr 1/2; B: sel 1/2, tpr 1, fpr 0
    // pooled: sel 1/2, tpr 3/4, fpr 1/4
    assert(r("A").getLong(2) == 500000L && r("A").getLong(3) == 500000L
      && r("A").getLong(4) == 500000L)
    assert(r("B").getLong(3) == 1000000L && r("B").getLong(4) == 0L)
    assert(r("A").getLong(5) == 0L, "A's selection gap vs pooled")
    assert(r("A").getLong(6) == 500000L - 750000L, "A under-hits by 1/4")
    assert(r("B").getLong(7) == 0L - 250000L, "B under-false-alarms by 1/4")
    graft.CacheScope.release()
  }

  test("fairnessReport: one-class groups report NULL rates and NULL gaps") {
    val rows = Seq(("A", true, true), ("A", true, false), ("B", false, false))
      .toDF("g", "y", "p")
    val r = Metrics.fairnessReport(rows, "g", "y", "p").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("A").isNullAt(4) && r("A").isNullAt(7), "A has no negatives: fpr NULL")
    assert(r("B").isNullAt(3) && r("B").isNullAt(6), "B has no positives: tpr NULL")
    graft.CacheScope.release()
  }

  test("fairnessFromCounts: weighted form equals exploded rows") {
    val rows = (1 to 120).map(i => (s"g${i % 3}", i % 2 == 0, i % 5 < 2))
    val counts = rows.groupBy(identity).toSeq.map { case ((g, y, p), v) =>
      (g, y, p, v.size.toLong) }.toDF("g", "y", "p", "n")
    val a = Metrics.fairnessReport(rows.toDF("g", "y", "p"), "g", "y", "p")
      .collect().map(_.toSeq).toSet
    val b = Metrics.fairnessFromCounts(counts, "g", "y", "p", "n")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    graft.CacheScope.release()
  }

  // ---- classificationReport ---------------------------------------------------

  test("classificationReport: hand-computed multiclass case, F1 as one rational") {
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
      ("c", "c")).toDF("y", "p")
    val r = Metrics.classificationReport(rows, "y", "p").collect()
      .map(x => x.getString(0) -> x).toMap
    // a: support 3, tp 2, fp 1 (b→a), fn 1 → P=R=F1=2/3
    assert(r("a").getLong(1) == 3L && r("a").getLong(2) == 2L
      && r("a").getLong(3) == 1L && r("a").getLong(4) == 1L)
    assert(r("a").getLong(5) == 666666L && r("a").getLong(6) == 666666L
      && r("a").getLong(7) == 666666L)
    assert(r("c").getLong(7) == 1000000L, "the clean class is perfect")
  }

  test("classificationReport: pred-only and truth-only classes both appear") {
    val rows = Seq(("a", "ghost"), ("missed", "a")).toDF("y", "p")
    val r = Metrics.classificationReport(rows, "y", "p").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("a", "ghost", "missed"))
    assert(r("ghost").getLong(1) == 0L && r("ghost").isNullAt(6),
      "pred-only class: support 0, recall NULL")
    assert(r("ghost").getLong(5) == 0L, "ghost precision 0 of 1 prediction")
    assert(r("missed").isNullAt(5), "never-predicted class: precision NULL")
    assert(r("missed").getLong(6) == 0L)
    graft.CacheScope.release()
  }

  // ---- classificationSummary --------------------------------------------------

  test("classificationSummary: hand case with a ghost and a missed class (exclude-and-count)") {
    // truth a,a,a,b,c,c; preds a,a,b,b,a,d — class c never predicted
    // (precision undefined), ghost d never true (recall undefined)
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("c", "a"), ("c", "d")).toDF("y", "p")
    val r = Metrics.classificationSummary(rows, "y", "p").collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 500000L) // accuracy 3/6
    // precision defined for a (666666), b (500000), d (0) → 1166666/3
    assert(r.getLong(3) == 388888L, r)
    // recall defined for a (666666), b (1000000), c (0) → 1666666/3
    assert(r.getLong(4) == 555555L, r)
    // f1 defined for all four: 666666+666666+0+0 → /4
    assert(r.getLong(5) == 333333L, r)
    assert(r.getLong(6) == 1L && r.getLong(7) == 1L)
    graft.CacheScope.release()
  }

  test("classificationSummary: perfect predictions; empty input") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("b", "b")).toDF("y", "p")
    val p = Metrics.classificationSummary(perfect, "y", "p").collect()(0)
    assert(p.getLong(2) == 1000000L && p.getLong(3) == 1000000L &&
      p.getLong(4) == 1000000L && p.getLong(5) == 1000000L)
    assert(p.getLong(6) == 0L && p.getLong(7) == 0L)
    graft.CacheScope.release()
    val empty = Seq.empty[(String, String)].toDF("y", "p")
    val e = Metrics.classificationSummary(empty, "y", "p").collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(2) &&
      e.isNullAt(3) && e.isNullAt(4) && e.isNullAt(5))
    graft.CacheScope.release()
  }

  // ---- matthewsCorrelation ---------------------------------------------------

  test("matthewsCorrelation: binary hand case matches the tp/tn/fp/fn form") {
    // tp=4, tn=3, fp=1, fn=2 → MCC = (4·3 − 1·2)/√(5·6·4·5) = 10/√600
    //   = 0.40824829… → 408248 micro (the Gorodkin form reduces to it)
    val rows = (Seq.fill(4)(("1", "1")) ++ Seq.fill(3)(("0", "0")) ++
      Seq.fill(1)(("0", "1")) ++ Seq.fill(2)(("1", "0"))).toDF("y", "p")
    val r = Metrics.matthewsCorrelation(rows, "y", "p").collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 7L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 408248L, r)
    graft.CacheScope.release()
  }

  test("matthewsCorrelation: perfect 1e6, inverse -1e6, one-class NULL") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("y", "p")
    assert(Metrics.matthewsCorrelation(perfect, "y", "p").collect()(0)
      .getLong(3) == 1000000L)
    graft.CacheScope.release()
    val inverse = Seq(("a", "b"), ("b", "a")).toDF("y", "p")
    assert(Metrics.matthewsCorrelation(inverse, "y", "p").collect()(0)
      .getLong(3) == -1000000L)
    graft.CacheScope.release()
    // one-class truth: s² − Σt² = 0 → undefined, NULL (never 0)
    val oneClass = Seq(("a", "a"), ("a", "b")).toDF("y", "p")
    assert(Metrics.matthewsCorrelation(oneClass, "y", "p").collect()(0)
      .isNullAt(3))
    graft.CacheScope.release()
    // constant prediction: s² − Σp² = 0 → NULL likewise
    val onePred = Seq(("a", "a"), ("b", "a")).toDF("y", "p")
    assert(Metrics.matthewsCorrelation(onePred, "y", "p").collect()(0)
      .isNullAt(3))
    graft.CacheScope.release()
  }

  test("matthewsCorrelation: NULL rows excluded; empty input gives n=0, NULL mcc") {
    val withNull = Seq[(String, String)](("a", "a"), (null, "a"), ("a", null))
      .toDF("y", "p")
    val r = Metrics.matthewsCorrelation(withNull, "y", "p").collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    graft.CacheScope.release()
    val empty = Seq.empty[(String, String)].toDF("y", "p")
    val e = Metrics.matthewsCorrelation(empty, "y", "p").collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(2) == 0L && e.isNullAt(3))
    graft.CacheScope.release()
  }

  // ---- fleissKappa -----------------------------------------------------------

  test("fleissKappa: 2-item 2-rater hand case gives -1/3 (negative-safe floor)") {
    // item 1: both raters say A; item 2: split A/B
    //   P̄ = 1/2, p_A = 3/4 → P̄_e = 5/8... integer form:
    //   N=2 n=2 S2=6 T=10 → κ = ((6−4)·4 − 10·1)/(1·(16−10)) = −2/6 = −1/3
    //   floor(1e6·(−1/3)) = −333334 (floor, NOT truncation toward zero)
    val r = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B")).toDF("item", "cat")
    val out = Metrics.fleissKappa(r, "item", "cat").collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L && out.getLong(2) == 2L)
    assert(out.getLong(3) == -333334L, out)
    graft.CacheScope.release()
  }

  test("fleissKappa: perfect agreement 1e6; single category 1e6; one rater NULL") {
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B")).toDF("item", "cat")
    assert(Metrics.fleissKappa(perfect, "item", "cat").collect()(0)
      .getLong(3) == 1000000L)
    graft.CacheScope.release()
    // single category anywhere → T = (Nn)² → everyone agreed on everything
    val oneCat = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A")).toDF("item", "cat")
    assert(Metrics.fleissKappa(oneCat, "item", "cat").collect()(0)
      .getLong(3) == 1000000L)
    graft.CacheScope.release()
    // one rater per item: nothing to agree with → NULL, not 1e6
    val solo = Seq((1L, "A"), (2L, "B")).toDF("item", "cat")
    val s = Metrics.fleissKappa(solo, "item", "cat").collect()(0)
    assert(s.getLong(1) == 1L && s.isNullAt(3))
    graft.CacheScope.release()
  }

  test("fleissKappa: Fleiss-textbook-shape case matches the brute rational") {
    // 4 items, 3 raters, 3 categories — computed by hand from the
    // integer form: S2 = Σ n_ij², T = Σ C_j²
    //   item1: A,A,B  item2: B,B,B  item3: A,B,C  item4: C,C,A
    // S2 = (4+1)+(9)+(1+1+1)+(4+1) = 22; C_A=4 C_B=5 C_C=3 → T=50
    // N=4 n=3 Nn=12: num = (22−12)·12 − 50·2 = 20; den = 2·(144−50) = 188
    // κ = 20/188 = 5/47 = 0.10638… → 106382 micro
    val r = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"),
      (2L, "B"), (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"),
      (4L, "C"), (4L, "C"), (4L, "A")).toDF("item", "cat")
    val out = Metrics.fleissKappa(r, "item", "cat").collect()(0)
    assert(out.getLong(0) == 4L && out.getLong(1) == 3L && out.getLong(2) == 3L)
    assert(out.getLong(3) == 106382L, out)
    graft.CacheScope.release()
  }

  test("kappa weighted forms: FromCounts on pre-aggregated cells equals the exploded operator") {
    // cohen: 4 (A,A) + 3 (B,B) + 2 (A,B) + 1 (B,A) — counts vs explosion
    val cCells = Seq(("A", "A", 4L), ("B", "B", 3L), ("A", "B", 2L), ("B", "A", 1L))
    val cRows = cCells.flatMap { case (a, b, n) => Seq.fill(n.toInt)((a, b)) }
    val wc = Metrics.cohenKappaFromCounts(
      cCells.toDF("a", "b", "n"), "a", "b", "n").collect()(0)
    val xc = Metrics.cohenKappa(cRows.toDF("a", "b"), "a", "b").collect()(0)
    assert(wc.toSeq == xc.toSeq, s"cohen weighted $wc != exploded $xc")
    graft.CacheScope.release()
    // fleiss: the textbook-shape case as cells
    val fCells = Seq((1L, "A", 2L), (1L, "B", 1L), (2L, "B", 3L),
      (3L, "A", 1L), (3L, "B", 1L), (3L, "C", 1L), (4L, "C", 2L), (4L, "A", 1L))
    val fRows = fCells.flatMap { case (i, c, n) => Seq.fill(n.toInt)((i, c)) }
    val wf = Metrics.fleissKappaFromCounts(
      fCells.toDF("item", "cat", "n"), "item", "cat", "n").collect()(0)
    val xf = Metrics.fleissKappa(fRows.toDF("item", "cat"), "item", "cat")
      .collect()(0)
    assert(wf.toSeq == xf.toSeq, s"fleiss weighted $wf != exploded $xf")
    assert(wf.getLong(3) == 106382L)
    graft.CacheScope.release()
  }

  test("fleissKappa: unequal per-item rating counts fail loudly; empty input NULL") {
    val uneven = Seq((1L, "A"), (1L, "A"), (2L, "B")).toDF("item", "cat")
    val e = intercept[Exception] {
      Metrics.fleissKappa(uneven, "item", "cat").collect()
    }
    assert(e.getMessage.contains("fixed rater count") ||
      e.getCause != null && e.getCause.getMessage.contains("fixed rater count"),
      e.getMessage)
    graft.CacheScope.release()
    val empty = Seq.empty[(Long, String)].toDF("item", "cat")
    val out = Metrics.fleissKappa(empty, "item", "cat").collect()(0)
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L && out.isNullAt(3))
    graft.CacheScope.release()
  }

  // ---- mcnemar --------------------------------------------------------------

  test("mcnemar: hand case, symmetry, and the no-disagreement NULL") {
    val rows = Seq((true, false), (true, false), (true, false), (false, true),
      (true, true), (false, false)).toDF("a", "b")
    val r = Metrics.mcnemar(rows, "a", "b").collect()(0)
    // b=3, c=1: chi2 = (3-1)^2/(3+1) = 1 exactly
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getLong(3) == 1000000L)
    val sym = Metrics.mcnemar(rows, "b", "a").collect()(0)
    assert(sym.getLong(3) == r.getLong(3), "the statistic is symmetric")
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Metrics.mcnemar(agree, "a", "b").collect()(0).isNullAt(3))
    val withNull = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, false), (null, true), (true, null)).toDF("a", "b")
    assert(Metrics.mcnemar(withNull, "a", "b").collect()(0).getLong(0) == 1L)
  }

  // ---- concentrationProfile --------------------------------------------

  private def conc(rows: Seq[(String, Long)]) =
    Metrics.concentrationProfile(rows.toDF("k", "w"), "k", "w").collect()(0)

  test("concentrationProfile: uniform weights — gini 0, hhi 1/n") {
    val r = conc((1 to 8).map(i => (s"k$i", 100L)))
    assert(r.getLong(2) == 0L && r.getLong(3) == 125000L)
    assert(r.getLong(4) == 125000L, "top1 = 1/8")
    assert(r.getLong(5) == 1000000L, "top10 of 8 keys = everything")
  }

  test("concentrationProfile: total concentration — gini (n-1)/n, hhi 1, top1 1") {
    val r = conc(Seq(("hog", 1000L)) ++ (1 to 9).map(i => (s"z$i", 0L)))
    assert(r.getLong(0) == 10L && r.getLong(1) == 1000L)
    assert(r.getLong(2) == 900000L, "gini = 9/10")
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 1000000L)
  }

  test("concentrationProfile: matches the local exact rational on hashed weights") {
    val rows = (1 to 300).map(i => (s"k$i", (i * 2654435761L % 997)))
    val local: (Long, Long, Long, Long) = {
      val ws = rows.map(_._2)
      val n = BigInt(ws.size); val W = BigInt(ws.sum)
      // rank by (w, k) — matches the operator's strict order
      val sorted = rows.sortBy(r => (r._2, r._1)).map(_._2)
      val iw = sorted.zipWithIndex.map { case (w, i) => BigInt(i + 1) * w }.sum
      val g = (BigInt(1000000) * (2 * iw - (n + 1) * W)) / (n * W)
      val hhi = (BigInt(1000000) * ws.map(w => BigInt(w) * w).sum) / (W * W)
      val t10 = BigInt(ws.sorted.reverse.take(10).sum) * 1000000 / W
      (g.toLong, hhi.toLong, t10.toLong, W.toLong)
    }
    val r = conc(rows)
    assert((r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(1)) == local)
  }

  test("concentrationProfile: negative key total fails loudly") {
    intercept[Exception] {
      conc(Seq(("a", 5L), ("b", -3L)))
    }
    graft.CacheScope.release()
  }

  // ---- jsDivergence -----------------------------------------------------

  private def jsd(rows: Seq[(String, Boolean)]) =
    Metrics.jsDivergence(rows.toDF("v", "a"), "v", "a").collect()(0)

  test("jsDivergence: identical distributions are 0; disjoint supports are ln 2") {
    val same = Seq(("x", true), ("y", true), ("x", false), ("y", false))
    assert(jsd(same).getLong(2) == 0L)
    // disjoint singletons: each side contributes round(1e6 * ln(2)/2)
    val disjoint = Seq(("x", true), ("y", false))
    assert(jsd(disjoint).getLong(2) == 2L * math.round(1e6 * math.log(2.0) / 2.0))
  }

  test("jsDivergence: matches the local term-by-term computation on skewed data") {
    val rows = (1 to 500).map(i => (s"v${i * 7 % 11}", i * 48271 % 3 == 0))
    val local: Long = {
      val ca = rows.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val cb = rows.filterNot(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val na = ca.values.sum.toDouble; val nb = cb.values.sum.toDouble
      (ca.keySet ++ cb.keySet).toSeq.map { v =>
        val p = ca.getOrElse(v, 0L) / na; val q = cb.getOrElse(v, 0L) / nb
        val t = (if (p > 0) 0.5 * p * math.log(2.0 * p / (p + q)) else 0.0) +
          (if (q > 0) 0.5 * q * math.log(2.0 * q / (p + q)) else 0.0)
        math.round(1e6 * t)
      }.sum
    }
    assert(jsd(rows).getLong(2) == local)
  }

  // ---- psi ---------------------------------------------------------------

  private def psiOf(rows: Seq[(String, Boolean)]) =
    Metrics.psi(rows.toDF("v", "a"), "v", "a").collect()(0)

  test("psi: identical distributions are 0; hand case matches term-by-term") {
    val same = Seq(("x", true), ("y", true), ("x", false), ("y", false))
    assert(psiOf(same).getLong(2) == 0L)
    // A = (1/2, 1/2), B = (1/4, 3/4)
    val rows = Seq(("x", true), ("y", true),
      ("x", false), ("y", false), ("y", false), ("y", false))
    val expected =
      math.round(1e6 * (0.5 - 0.25) * math.log(0.5 / 0.25)) +
      math.round(1e6 * (0.5 - 0.75) * math.log(0.5 / 0.75))
    assert(psiOf(rows).getLong(2) == expected)
  }

  test("psi: an empty bin on one side fails loudly (no silent smoothing)") {
    intercept[Exception] {
      psiOf(Seq(("x", true), ("y", true), ("x", false)))
    }
    graft.CacheScope.release()
  }

  test("psi: empty side reports NULL; counts form equals exploded rows") {
    assert(psiOf(Seq(("x", true), ("y", true))).isNullAt(2))
    // side from i % 3 so every i % 4 bin sees both sides
    val rows = (1 to 200).map(i => (s"v${i % 4}", i % 3 == 0))
    val counts = rows.groupBy(_._1).toSeq.map { case (v, r) =>
      (v, r.count(_._2).toLong, r.count(!_._2).toLong) }.toDF("v", "ca", "cb")
    val w = Metrics.psiFromCounts(counts, "v", "ca", "cb").collect()(0)
    assert(psiOf(rows).toSeq == w.toSeq)
  }

  test("jsDivergence: empty side reports NULL; counts form equals exploded rows") {
    assert(jsd(Seq(("x", true), ("y", true))).isNullAt(2))
    val rows = (1 to 200).map(i => (s"v${i % 6}", i % 3 == 0))
    val counts = rows.groupBy(_._1).toSeq.map { case (v, r) =>
      (v, r.count(_._2).toLong, r.count(!_._2).toLong) }.toDF("v", "ca", "cb")
    val w = Metrics.jsdFromCounts(counts, "v", "ca", "cb").collect()(0)
    assert(jsd(rows).toSeq == w.toSeq)
  }
}
