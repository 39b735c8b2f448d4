package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels every node with its component minimum") {
    // two components: a 5-node path 1-2-3-4-5 and a triangle 10-11-12
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L))
  }

  test("connectedComponents converges on a high-diameter path (39-node lineage probe)") {
    val pairs = (1L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 39L).forall(out(_) == 1L))
  }

  test("connectedComponents rounds are O(log diameter): 1000-link chain within 16 rounds") {
    // plain min-label propagation needs ~1000 rounds here; pointer jumping
    // must land it in ~log2(1000) + slack — the cap IS the assertion
    val pairs = (1L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b", maxRounds = 16)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 1000 && out.values.forall(_ == 1L))
  }

  test("simhashPairs rejects degenerate maxHamming instead of going N²") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64))
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = -1))
  }

  test("crossContamination flags exactly the corpus docs overlapping the eval set") {
    import spark.implicits._
    val evalSet = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog"),
      (1001L, "pack my box with five dozen liquor jugs"))
      .toDF("eval_id", "text")
    val corpus = Seq(
      // 7 distinct 3-grams of eval 1000 ride inside a longer doc
      (1L, "intro words then the quick brown fox jumps over the lazy dog and more"),
      // shares exactly two 3-grams with eval 1001 ('pack my box', 'my box with')
      (2L, "please pack my box with care today"),
      // clean
      (3L, "completely unrelated content about spark physical plans"),
      // contaminated by BOTH eval docs
      (4L, "the quick brown fox jumps over the lazy dog pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val out = Dedup.crossContamination(
      corpus, "doc_id", "text", evalSet, "eval_id", "text", n = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((1L, 1000L), (4L, 1000L), (4L, 1001L)),
      s"got ${out.keySet}")
    assert(out((1L, 1000L)) == 7L, "all 7 eval 3-grams appear in doc 1")
    assert(out((4L, 1001L)) == 6L, "6 of eval 1001's 3-grams fit in doc 4's tail")
    // doc 2 shares only 2 shingles — below minShared, must not be flagged

    // scale shape: the eval posting list must broadcast; the corpus side
    // must never shuffle before the count aggregation
    val plan = Dedup.crossContamination(
      corpus, "doc_id", "text", evalSet, "eval_id", "text", n = 3, minShared = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval posting must broadcast:\n$plan")
  }

  test("incrementalDedup: new-vs-history anti join + first-within-increment, text never rescanned") {
    import spark.implicits._
    import org.apache.spark.sql.functions.md5
    val seen = Seq("yesterday doc one", "yesterday doc two").toDF("text")
      .select(md5(col("text")).as("fp"))
    val inc = Seq(
      (10L, "today fresh alpha"),
      (11L, "yesterday doc one"),   // historical dup -> dropped
      (12L, "today fresh beta"),
      (13L, "today fresh alpha"),   // within-increment dup -> 10 wins
      (14L, "yesterday doc two"))   // historical dup -> dropped
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(inc, "doc_id", "text", seen, "fp")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L))
    // null text fingerprints as '' (a null digest would never match the
    // store — every later day's null rows would be "new" forever)
    val incNulls = Seq((20L, null), (21L, null), (22L, ""))
      .map { case (i, t) => (i, Option(t)) }.toDF("doc_id", "text")
    val day1 = Dedup.incrementalDedup(incNulls, "doc_id", "text", seen, "fp")
    assert(day1.collect().map(_.getLong(0)).toSet == Set(20L),
      "one representative across null/empty text on day 1")
    val seen2 = seen.unionByName(day1.select("fp"))
    val day2 = Dedup.incrementalDedup(
      Seq((30L, None: Option[String])).toDF("doc_id", "text"), "doc_id", "text", seen2, "fp")
    assert(day2.count() == 0, "day-2 null text must match the stored fingerprint")
    // store update is a pure union of kept fps — dedup of (history ∪ inc)
    // via the store equals deduping the concatenated corpora directly
    val full = Seq("yesterday doc one", "yesterday doc two").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .unionByName(inc)
    val direct = Relational.keepFirstBy(full, Seq("text"), Seq(col("doc_id")))
      .filter(col("doc_id") >= 10).collect().map(_.getLong(0)).toSet
    assert(direct == kept, "incremental result must equal the from-scratch dedup")
  }

  test("connectedComponents throws instead of returning non-converged labels") {
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("sourceOverlap: exact counts on a planted token-chain corpus; minhash estimate inside 4σ") {
    // A = bigrams t1t2..t60t61 (60), B = t31t32..t90t91 (60), shared 30
    // (t31t32..t60t61) → J = 30/90 = 1/3. C is all-short docs (no shingles).
    val docs = Seq(
      ("A", (1 to 61).map(i => s"t$i").mkString(" ")),
      ("B", (31 to 91).map(i => s"t$i").mkString(" ")),
      ("C", "solo")).toDF("source", "text")
    val exact = Dedup.sourceOverlap(docs, "source", "text", n = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    graft.CacheScope.release()
    // C emits no shingles → appears in no pair; A-B exact by construction
    assert(exact.keySet == Set(("A", "B")))
    assert(exact(("A", "B")) == ((60L, 60L, 30L, 90L,
      math.round(1e6 * 30.0 / 90.0))))
    val est = Dedup.sourceOverlapMinhash(docs, "source", "text", n = 2,
        numPerms = 512)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // every unordered pair of SKETCHED sources appears; C filtered out
    assert(est.keySet == Set(("A", "B")))
    // std = sqrt(J(1-J)/512) ≈ 0.021 → 4σ ≈ 0.083
    assert(math.abs(est(("A", "B")) - 1.0 / 3.0) < 0.085,
      s"estimate ${est(("A", "B"))} too far from 1/3")
  }

  test("sourceOverlapMinhash matches sourceOverlap within 4σ on the gate corpus") {
    val docs = graft.Tables.documents(spark, sf).select("source", "text")
    val exact = Dedup.sourceOverlap(docs, "source", "text", n = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(6).toDouble / 1e6)).toMap
    graft.CacheScope.release()
    val est = Dedup.sourceOverlapMinhash(docs, "source", "text", n = 2,
        numPerms = 256)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(est.size >= exact.size) // est also emits zero-overlap pairs
    // per-pair binomial bound: 4·sqrt(J(1−J)/numPerms), floored at 0.02
    exact.foreach { case (pair, j) =>
      val bound = math.max(0.02, 4.0 * math.sqrt(j * (1 - j) / 256.0))
      assert(math.abs(est(pair) - j) < bound,
        s"$pair: est ${est(pair)} vs exact $j (bound $bound)")
    }
  }

  test("incrementalNearDup == the cross-(increment, history) slice of the full pair set") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.CacheScope.release()
    // the from-scratch truth restricted to pairs straddling the split,
    // oriented (increment, history)
    val expected = full.flatMap { case (a, b, j) =>
      if (a % 10 == 0 && b % 10 != 0) Some((a, b, j))
      else if (b % 10 == 0 && a % 10 != 0) Some((b, a, j))
      else None
    }.toSet
    assert(expected.nonEmpty, "fixture must produce cross-split pairs")
    val store = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), graft.catalyst.ShingleExprs.shingleHashes(
        graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
    val got = Dedup.incrementalNearDup(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", store, "doc_id", "sh", n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      "incremental-vs-store must equal the from-scratch cross slice, jaccards included")
  }

  test("dedupKeepBest: one survivor per transitive cluster — the best, not the first") {
    import spark.implicits._
    // A~B and B~C by construction (~0.5 overlap each) but A and C share
    // little: a per-PAIR rule would keep both A and C; the component rule
    // must keep exactly one of the chain — the highest-quality row (B)
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val common1 = (1 to 12).map(i => s"x$i")
    val common2 = (1 to 12).map(i => s"y$i")
    val docs = Seq(
      (1L, mk(common1 ++ Seq("a1", "a2")), 10L),             // A
      (2L, mk(common1 ++ common2), 99L),                     // B — best quality
      (3L, mk(common2 ++ Seq("c1", "c2")), 20L),             // C
      (4L, mk((1 to 14).map(i => s"z$i")), 50L),             // singleton
      (5L, mk((1 to 14).map(i => s"z$i") :+ "tail"), 50L))   // near-dup of 4, tie quality
      .toDF("doc_id", "text", "q")
    val out = Dedup.dedupKeepBest(docs, "doc_id", "text", "q", n = 3, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    graft.CacheScope.release()
    val survivors = out.map(_._1).toSet
    assert(survivors == Set(2L, 4L),
      s"expected the chain to collapse to B and the tie to break to the lower id, got $survivors")
    // the chain's survivor is tagged with the component rep (min id = 1)
    assert(out.find(_._1 == 2L).get._2 == 1L)
  }

  test("splitLeakage == the split-crossing slice of the full near-dup pair set") {
    val docs = graft.Tables.documents(spark, sf)
    val cuts = Seq("train" -> 80, "valid" -> 90, "test" -> 100)
    val leaks = Dedup.splitLeakage(docs, "doc_id", "text", cuts, n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val split = graft.operators.Relational.hashSplit(docs, "text", cuts)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs.collect {
      case (a, b) if split(a) != split(b) => (a, b, split(a), split(b))
    }.toSet
    assert(leaks.toSet == expected,
      "leakage must be exactly the near-dup pairs whose sides land in different splits")
    assert(leaks.nonEmpty, "the gate corpus is known to contain crossing pairs")
    assert(leaks.forall { case (_, _, sa, sb) => sa != sb })
  }

  test("dedupAwareSplit: zero near-dup pairs straddle splits; plain hashSplit provably leaks") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val cuts = Seq("train" -> 80, "valid" -> 90, "test" -> 100)
    val out = Dedup.dedupAwareSplit(docs, "doc_id", "text", n = 3, minJaccard = 0.4, cuts)
    val split = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheScope.release()
    assert(pairs.nonEmpty && split.size == docs.count())
    val straddling = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(straddling.isEmpty,
      s"near-dup pairs split apart: ${straddling.take(5).toSeq}")
    // the CONTROL: the doc-hash split does leak on the same corpus —
    // without it the assertion above would be vacuous
    val naive = graft.operators.Relational.hashSplit(docs, "text", cuts)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "gate corpus must contain pairs the naive split separates")
  }

  test("exactSubstringSpans: cross-doc and intra-doc repeats, maximal islands, exact bounds") {
    // `common` is 44 chars, non-periodic. doc 1 carries it at position 1,
    // doc 2 at position 11; doc 3 shares nothing; doc 4 repeats its own
    // 40-char chunk twice (intra-doc repeats count — Lee et al.).
    val common = "the quick brown fox jumps over lazy dog 0123" // 44 chars
    assert(common.length == 44)
    val chunk = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmn" // 40 chars
    assert(chunk.length == 40)
    // the characters AFTER `common` differ ('!' vs '&') — a shared
    // trailing char would extend the repeated run by one (caught by the
    // first version of this fixture, where both tails began with ' ')
    val docs = Seq(
      (1L, common + "!unique tail for document number one!!"),
      (2L, "ten chars " + common + "&and a different ending here"),
      (3L, "this text shares no forty-char run with anything else in the corpus at all"),
      (4L, chunk + " some unique middle filler text " + chunk)).toDF("doc_id", "text")
    val got = Dedup.exactSubstringSpans(docs, "doc_id", "text", minLen = 40)
      .as[(Long, Long, Long)].collect().toSet
    // doc1: windows 1..5 of `common` repeat -> island [1..5], span 5+40-1 = 44
    // doc2: same island shifted by the 10-char prefix -> start 11, span 44
    // doc4: chunk at 1 (1 window) and at 73 (1 window), separated -> two 40-spans
    val want = Set(
      (1L, 1L, 44L),
      (2L, 11L, 44L),
      (4L, 1L, 40L),
      (4L, 73L, 40L))
    assert(got == want, s"got $got want $want")
    // raising minLen above the repeat length empties the result
    assert(Dedup.exactSubstringSpans(docs, "doc_id", "text", minLen = 45).count() == 0)
  }
}
