package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def queriesSubset: DataFrame =
    Tables.embeddings(spark, sf).filter(col("vec_id") % 100 === 0)

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val brute = topkSet(Similarity.bruteForceTopK(
    Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding", k = 5))

  test("LSH top-k recall vs brute force: sane at default knobs, rises with more bands") {
    def recallAt(bands: Int): Double = {
      val lsh = topkSet(Similarity.lshTopK(
        Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding",
        k = 5, nBits = 16, bands = bands))
      (lsh & brute).size.toDouble / brute.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16) // 1-bit bands: near-total candidate coverage
    info(f"LSH recall@5: bands=4 -> $r4%.3f, bands=16 -> $r16%.3f (${brute.size} truth pairs)")
    assert(r4 >= 0.3, f"LSH recall collapsed at default knobs: $r4%.3f")
    assert(r16 >= r4, "more bands must not lose recall")
    assert(r16 >= 0.9, f"1-bit bands should approach brute force, got $r16%.3f")
  }

  test("IVF recall rises with nprobe; probing all buckets IS brute force") {
    def recallAt(nprobe: Int): Double = {
      val ivf = topkSet(Similarity.ivfTopK(
        Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = nprobe))
      (ivf & brute).size.toDouble / brute.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16)
    info(f"IVF recall@5: nprobe=4 -> $r4%.3f, nprobe=16 -> $r16%.3f (${brute.size} truth pairs)")
    assert(r4 >= 0.3, f"IVF recall collapsed at default knobs: $r4%.3f")
    assert(r16 == 1.0, "nprobe == nlist scans the whole corpus: must equal brute force")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded near-dup candidates: recall 1.0 vs the exact pair set at gate defaults") {
    val emb = Tables.embeddings(spark, sf)
    val exact = pairSet(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    val banded = pairSet(Similarity.cosineNearDupCandidates(emb, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty, "gate data must contain near-dup pairs for recall to mean anything")
    assert((banded -- exact).isEmpty,
      s"verify admits no false positives, but got ${(banded -- exact).take(5)}")
    val recall = (banded & exact).size.toDouble / exact.size
    info(f"banded-candidate recall vs exact: $recall%.4f over ${exact.size} true pairs")
    assert(recall == 1.0,
      s"q56 gate contract: band family must not miss pairs; missed ${(exact -- banded).take(5)}")
  }

  // --- derived band families (deriveBands / cosineNearDupAuto) ---------

  /** Gate corpus plus, for each base vector u, a planted twin at cosine
    * exactly `tau + 0.02` with u: v' = s·u + √(1−s²)·ŵ where ŵ is the
    * unit component of a deterministic companion direction (circular
    * shift) orthogonal to u. Gives every sweep threshold a non-empty
    * truth set (the raw gate data has no pairs above 0.6). */
  private def plantedCorpus(tau: Double): DataFrame = {
    val base = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    def unit(x: Array[Double]) = { val n = math.sqrt(dot(x, x)); x.map(_ / n) }
    val s = tau + 0.02
    val planted = base.map { case (id, v) =>
      val u = unit(v.map(_.toDouble))
      val e = Array.tabulate(u.length)(i => u((i + 1) % u.length))
      val orth = e.zip(u).map { case (ei, ui) => ei - dot(e, u) * ui }
      val w = unit(orth)
      (id + 100000L, u.zip(w).map { case (ui, wi) =>
        (s * ui + math.sqrt(1 - s * s) * wi).toFloat })
    }
    import spark.implicits._
    (base ++ planted).toSeq.toDF("vec_id", "embedding")
  }

  test("deriveBands honors the recall bound and prunes monotonically harder with threshold") {
    val taus = Seq(0.45, 0.6, 0.8, 0.9)
    val plans = taus.map(Similarity.deriveBands(_, targetRecall = 0.9999))
    for ((t, p) <- taus.zip(plans)) {
      info(f"tau=$t: ${p.sketchSeeds.length} x ${p.bands} bands of ${p.bandBits} bits, " +
        f"miss=${p.missAtThreshold}%.2e, candidateFraction=${p.candidateFraction}%.4f")
      assert(p.missAtThreshold <= 1e-4 + 1e-12,
        s"tau=$t: derived family violates its own recall bound")
      assert(p.nBits <= 64 && p.nBits % p.bands == 0, s"tau=$t: invalid sketch layout")
    }
    val fractions = plans.map(_.candidateFraction)
    assert(fractions.zip(fractions.tail).forall { case (lo, hi) => hi < lo },
      s"candidate fraction must fall as the threshold tightens: $fractions")
  }

  test("derived families: recall 1.0 vs exact pairs at tau in {0.45, 0.6, 0.8, 0.9}") {
    for (tau <- Seq(0.45, 0.6, 0.8, 0.9)) {
      val corpus = plantedCorpus(tau)
      val exact = pairSet(Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", tau))
      val banded = pairSet(Similarity.cosineNearDupCandidates(corpus, "vec_id", "embedding", tau))
      assert(exact.size >= 500, s"tau=$tau: planted corpus must contain a real truth set")
      assert((banded -- exact).isEmpty, s"tau=$tau: verify admits no false positives")
      assert(banded == exact,
        s"tau=$tau: derived family missed ${(exact -- banded).size} of ${exact.size} pairs")
      info(s"tau=$tau: ${exact.size} true pairs, all recovered")
    }
  }

  test("measured candidate counts fall as the threshold tightens (derived families)") {
    val emb = Tables.embeddings(spark, sf)
    // families as a 1M-row corpus would derive them — at spec-corpus size
    // the cost model rightly stops paying for pruning, which would make
    // this measurement vacuous
    val counts = Seq(0.45, 0.8).map { tau =>
      val p = Similarity.deriveBands(tau, corpusSize = 1L << 20)
      val c = Similarity.cosineBandCandidates(
        emb, "vec_id", "embedding", p.nBits, p.bands, p.sketchSeeds).count()
      info(f"tau=$tau: ${c} candidates (fraction bound ${p.candidateFraction}%.4f)")
      c
    }
    assert(counts(1) < counts(0),
      s"tight-threshold family must emit fewer candidates: $counts")
  }

  test("auto dispatch reproduces the measured crossover and the exact pair set") {
    // Calibrated on the r6 ScaleProbe (20k vectors): exact tiled 16.9s,
    // derived-band tau=0.8 family 21.7s, tau=0.45 family 154s. Exact wins
    // at tau=0.45 at EVERY N (the verify term alone exceeds exact cost);
    // at recall-0.9999 derived families the sketch + band-row machinery
    // doesn't amortize at 20k, so the tau=0.8 crossover sits just above
    // the probed size. (r5's 'banded wins at tau=0.8/20k' used a
    // hand-tuned 48-band family with a ~150x weaker miss bound — not the
    // recall contract the dispatcher promises.)
    def pick(tau: Double, n: Long) =
      Similarity.bandedCheaper(n, Similarity.deriveBands(tau, corpusSize = n))
    assert(!pick(0.45, 20000), "tau=0.45 is the banding-degenerate regime: exact must win")
    assert(!pick(0.45, 1000000))
    assert(!pick(0.9, 500), "sketch cost can't amortize over a tiny corpus")
    assert(!pick(0.8, 20000), "measured r6: exact won tau=0.8 at 20k, 16.9s vs 21.7s")
    assert(pick(0.8, 200000), "model: banded 3.4x cheaper by 200k")
    assert(pick(0.8, 1000000))
    assert(pick(0.9, 1000000))
    // end-to-end on gate data: the dispatcher (exact arm at this N) must
    // emit exactly the pair set both arms promise
    val emb = Tables.embeddings(spark, sf)
    val auto = Similarity.cosineNearDupAuto(emb, "vec_id", "embedding", 0.45)
    assert(!auto.queryExecution.analyzed.toString.contains("_bk"),
      "at N=500 the dispatcher must take the exact tiled arm")
    assert(pairSet(auto) == pairSet(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)))
  }

  // --- IVF near-dup pair arm (q223 / q135 cluster stage) ----------------

  test("ivfNearDupPairs: no false positives; recall rises with nProbe; full probe == exact") {
    val emb = Tables.embeddings(spark, sf)
    val exact = pairSet(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty, "gate data must contain near-dup pairs")
    def recallAt(np: Int): Double = {
      val got = pairSet(Similarity.ivfNearDupPairs(emb, "vec_id", "embedding", 0.45,
        nProbe = np))
      assert((got -- exact).isEmpty,
        s"nProbe=$np: exact verify admits no false positives, got ${(got -- exact).take(5)}")
      (got & exact).size.toDouble / exact.size
    }
    val n = emb.count()
    val kCells = math.max(4, math.min(4096, math.floor(math.sqrt(n.toDouble)).toInt))
    val rs = Seq(1, 3, kCells).map(np => np -> recallAt(np))
    rs.foreach { case (np, r) => info(f"pair recall@nProbe=$np: $r%.3f") }
    assert(rs.map(_._2).zip(rs.map(_._2).tail).forall { case (lo, hi) => hi >= lo },
      s"pair recall must be monotone in nProbe: $rs")
    assert(rs.last._2 == 1.0,
      "probing every cell makes every pair a candidate: must equal the exact pair set")
    assert(rs(1)._2 >= 0.3, f"default-knob pair recall collapsed: ${rs(1)._2}%.3f")
  }

  test("nearDupPlan: three-way cost model — IVF only on opt-in, exact below the crossover") {
    // exact-contract dispatch can never pick the approximate arm
    for (tau <- Seq(0.45, 0.8); n <- Seq(500L, 20000L, 1000000L))
      assert(Similarity.nearDupPlan(n, tau) != "ivf",
        s"recall-1.0 dispatch must never pick the approximate arm (tau=$tau n=$n)")
    // the exact-contract decisions are bandedCheaper verbatim
    assert(Similarity.nearDupPlan(20000L, 0.45) == "exact")
    assert(Similarity.nearDupPlan(200000L, 0.8) == "banded")
    // production dispatch: small corpora verify exactly for free; the
    // banding-degenerate tau=0.45 regime goes IVF once the quadratic term
    // dominates the partition cost (model crossover ~2k vectors)
    assert(Similarity.nearDupPlan(500L, 0.45, allowApprox = true) == "exact")
    assert(Similarity.nearDupPlan(100000L, 0.45, allowApprox = true) == "ivf")
    assert(Similarity.nearDupPlan(1000000L, 0.45, allowApprox = true) == "ivf")
    // IVF prunes by partition, so it also beats the banded arm at scale
    // where banding is feasible — the caller's recall contract, not cost,
    // is what keeps the banded arm in the family
    assert(Similarity.nearDupPlan(1000000L, 0.8, allowApprox = true) == "ivf")
  }

  test("cosineNearDupAutoApprox at gate size takes the exact arm and equals the exact pairs") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.cosineNearDupAutoApprox(emb, "vec_id", "embedding", 0.45)
    assert(pairSet(got) == pairSet(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)))
  }

  test("band candidates prune: wider bands cut candidates; narrower bands regain recall") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    // prune knob: 6-bit bands (one seed) must generate strictly fewer
    // candidates than 3-bit bands (three seeds), which in turn must stay
    // below the all-pairs count — the banding is doing SOME work even at
    // this low threshold (at >= 0.8 thresholds the gap widens sharply).
    val wide = Similarity.cosineBandCandidates(emb, "vec_id", "embedding",
      nBits = 60, bands = 10, sketchSeeds = Seq(42L)).count()
    val narrow = Similarity.cosineBandCandidates(emb, "vec_id", "embedding",
      nBits = 60, bands = 20, sketchSeeds = Seq(42L, 43L, 44L)).count()
    info(f"candidates: 6-bit x10 bands -> $wide (${wide * 100.0 / allPairs}%.1f%% of $allPairs), " +
      f"3-bit x60 bands -> $narrow (${narrow * 100.0 / allPairs}%.1f%%)")
    assert(wide < narrow, "wider bands must prune harder than narrow ones")
    assert(narrow < allPairs, "candidate set must stay below all-pairs")
  }

  test("bandBits == 64 does not collapse every band value to bucket 0 (mask overflow)") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val cand = Similarity.cosineBandCandidates(emb, "vec_id", "embedding",
      nBits = 64, bands = 1, sketchSeeds = Seq(42L))
    // with the mod-64 shift bug every pair collides (one bucket): 50*49/2
    assert(cand.count() < 50L * 49 / 2,
      "nBits=64, bands=1 must bucket by the full sketch, not send all rows to bucket 0")
  }

  test("every ANN result is a real corpus neighbor with correct rank ordering") {
    val ivf = Similarity.ivfTopK(
      Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
    // ranks are 1..k, sims non-increasing per query
    val bad = ivf.groupBy("query_id").agg(
        max("rank").as("maxr"), count(lit(1)).as("n"),
        (min("sim") <= max("sim")).as("mono"))
      .filter(col("maxr") =!= col("n") || !col("mono"))
    assert(bad.count() == 0)
  }

  // Driver-side cosine oracle over a small slice: unit-normalize, score
  // every ordered pair, round to sim_micro — independent of every Spark
  // code path the operators under test use.
  private def cosOracle(n: Int): Map[Long, Seq[(Long, Long)]] = {
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < n)
      .collect().map { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
        val norm = math.sqrt(v.map(x => x * x).sum)
        r.getLong(r.fieldIndex("vec_id")) -> v.map(_ / norm)
      }.toMap
    vecs.map { case (q, qv) =>
      q -> vecs.toSeq.collect { case (c, cv) if c != q =>
        (c, math.round(qv.zip(cv).map { case (a, b) => a * b }.sum * 100000))
      }.map { case (c, s) => (s, c) }.sortBy { case (s, c) => (-s, c) }
        .map { case (s, c) => (c, s) }
    }
  }

  test("knnGraph == driver-side brute force; invariant to the block count") {
    val n = 120
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < n)
    val expected = cosOracle(n).map { case (q, ns) => q -> ns.take(4) }
    def got(blocks: Int): Map[Long, Seq[(Long, Long)]] =
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 4, blocks = blocks)
        .orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    val g1 = got(1)
    assert(g1 == expected, "knnGraph must equal the exact top-k per query")
    assert(got(5) == g1, "tiling is a physical knob — it must not change one edge")
    intercept[IllegalArgumentException] {
      Similarity.knnGraph(emb.withColumn("vec_id", col("vec_id").cast("string")),
        "vec_id", "embedding", k = 4)
    }
  }

  test("ivfKnnGraph: contract laws — schema, ranks, no self-edges, physical invariance") {
    val emb = Tables.embeddings(spark, sf)
    val g = Similarity.ivfKnnGraph(emb, "vec_id", "embedding", k = 3)
    assert(g.columns.toSeq == Seq("query_id", "neighbor_id", "sim_micro", "rank"),
      "production twin must keep knnGraph's exact schema (the loops consume either)")
    val rows = g.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.forall { case (q, n, _, _) => q != n }, "no self edges")
    rows.groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), "ranks dense from 1")
      assert(sorted.length <= 3, "degree capped at k")
      val order = sorted.map(e => (-e._3, e._2)).toSeq
      assert(order == order.sorted, "rank order must be (sim desc, neighbor asc)")
    }
    // Physical invariance: input partitioning is a knob, not a semantic —
    // the md5 seeds, integer Lloyd rounds and exact re-rank make the
    // edge set a pure function of the data.
    val g2 = Similarity.ivfKnnGraph(emb.repartition(7), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(g2.toSet == rows.toSet, "repartitioning must not change one edge")
    intercept[IllegalArgumentException] {
      Similarity.ivfKnnGraph(emb.withColumn("vec_id", col("vec_id").cast("string")),
        "vec_id", "embedding", k = 3)
    }
  }

  test("ivfKnnGraph: recall vs the exhaustive build is data-bound and rises with nProbe") {
    val emb = Tables.embeddings(spark, sf)
    val exact = topkSet(Similarity.knnGraph(emb, "vec_id", "embedding", k = 3))
    def recallAt(np: Int): Double = {
      val approx = topkSet(Similarity.ivfKnnGraph(emb, "vec_id", "embedding",
        k = 3, nProbe = np))
      (approx & exact).size.toDouble / exact.size
    }
    val r3 = recallAt(3)
    val r10 = recallAt(10)
    // The gate corpus is NEAR-RANDOM (top-3 sims center on ~0.38), the
    // adversarial case for any partition-pruned ANN — measured recall
    // here is a floor, not what clustered production embeddings give.
    info(f"ivfKnnGraph recall@3: nProbe=3 -> $r3%.3f, nProbe=10 -> $r10%.3f")
    assert(r3 >= 0.30, f"IVF graph recall collapsed at gate knobs: $r3%.3f")
    assert(r10 >= r3, "probing more cells must not lose recall")
    // Every approximate edge is a REAL pair scored with the exact
    // convention: sims of IVF edges can never exceed the exact top-1.
    val top1 = Similarity.knnGraph(emb, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    Similarity.ivfKnnGraph(emb, "vec_id", "embedding", k = 3).collect()
      .foreach(r => assert(r.getLong(2) <= top1(r.getLong(0)),
        "an IVF edge outscored the exhaustive top-1 — scoring conventions diverged"))
  }

  test("hardNegatives: top-k WITHIN the band — never a near-dup, never below the floor") {
    val n = 200
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < n)
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val (lo, hi) = (0.10, 0.45)
    val got = Similarity.hardNegatives(emb, qs, "vec_id", "embedding",
        k = 6, loSim = lo, hiSim = hi)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty)
    assert(got.forall { case (q, c, s, _) => q != c && s >= lo && s < hi },
      "every mined negative must sit strictly inside the band")
    // band-THEN-rank: the result is the top-k of the banded candidates,
    // which the driver-side oracle reproduces exactly (micro-sim grain)
    val oracle = cosOracle(n)
    val expected = qs.select("vec_id").collect().map(_.getLong(0)).map { q =>
      q -> oracle(q).filter { case (_, s) =>
        s >= math.round(lo * 100000) && s < math.round(hi * 100000) }.take(6)
    }.toMap
    val byQuery = got.groupBy(_._1).view.mapValues(
      _.sortBy(_._4).map(x => (x._2, math.round(x._3 * 100000))).toSeq).toMap
    assert(byQuery == expected)
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(emb, qs, "vec_id", "embedding", 5, 0.5, 0.5)
    }
  }

  test("contrastivePairs: anchors without a positive vanish; arms equal their primitives") {
    val emb = Tables.embeddings(spark, sf)
    val anchors = emb.filter(col("vec_id") % 100 === 0)
    val (posMin, nNeg, lo, hi) = (0.30, 4, 0.05, 0.30)
    val out = Similarity.contrastivePairs(emb, anchors, "vec_id", "embedding",
        posMin, nNeg, lo, hi)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getInt(4)))
    val pos = out.filter(_._3 == "pos")
    val neg = out.filter(_._3 == "neg")
    // the positive arm IS bruteForceTopK(k=1) thresholded
    val top1 = Similarity.bruteForceTopK(emb, anchors, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pos.map(p => (p._1, p._2, p._4)).toSet ==
      top1.filter(_._3 >= posMin).toSet)
    // every anchor in the output has a positive; negatives only for those
    assert(neg.map(_._1).toSet.subsetOf(pos.map(_._1).toSet),
      "negatives must never be emitted for an anchor without a positive")
    assert(neg.forall { case (_, _, _, s, _) => s >= lo && s < hi })
    // a raised posMin drops anchors entirely, not just their positives
    val strict = Similarity.contrastivePairs(emb, anchors, "vec_id", "embedding",
        0.99, nNeg, lo, hi).collect()
    assert(strict.isEmpty, "no anchor has a 0.99 positive in the gate corpus")
    intercept[IllegalArgumentException] {
      Similarity.contrastivePairs(emb, anchors, "vec_id", "embedding", 0.3, 4, 0.05, 0.5)
    }
  }

  test("crossNearDup: planted contamination found exactly; clean refs stay clean") {
    val corpus = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // refs = exact copies of every 100th corpus vector (sim 1.0 planted
    // contamination) plus one vector orthogonal-ish to everything (a
    // genuinely clean benchmark row)
    val copies = corpus.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    import spark.implicits._
    val clean = Seq((999999L,
      Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.crossNearDup(corpus, "vec_id", "embedding",
        copies.unionByName(clean), "vec_id", "embedding", minSim = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.CacheScope.release()
    val expected = corpus.filter(col("vec_id") % 100 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == expected,
      "every planted copy's source must be flagged, nothing else")
    assert(got.forall { case (c, r, s) => r == c + 500000L && s > 0.999 },
      "each source must pair with ITS copy at sim ~1.0")
    assert(!got.exists(_._2 == 999999L), "the clean ref must not be flagged")
  }
}
