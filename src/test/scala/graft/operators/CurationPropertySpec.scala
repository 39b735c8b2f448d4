package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the curation operators (q57-q59,
  * q64-q65): the laws a training pipeline silently depends on, checked
  * over randomized inputs rather than fixtures. Spark jobs per case are
  * small, so case counts are kept modest.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val wordGen: Gen[String] = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("chunkTokens law: chunks cover every token in order; overlap is exactly `overlap`") {
    val docGen = for {
      nTok <- Gen.choose(1, 120)
      words <- Gen.listOfN(nTok, wordGen)
      window <- Gen.choose(2, 50)
      overlap <- Gen.choose(0, window - 1)
    } yield (words, window, overlap)
    check(Prop.forAll(docGen) { case (words, window, overlap) =>
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextOps.chunkTokens(df, "doc_id", "text", window, overlap)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getInt(1), r.getString(3).split(" ").toSeq))
      val step = window - overlap
      // every chunk k IS the slice starting at k*step (definition), chunk
      // indices are dense from 0, and the last chunk reaches the end of
      // the document (coverage)
      val slicesOk = chunks.forall { case (k, toks) =>
        toks == words.slice(k * step, math.min(k * step + window, words.length)) }
      val denseOk = chunks.map(_._1).toSeq == chunks.indices.toSeq
      val coverageOk = chunks.lastOption.exists { case (k, toks) =>
        k * step + toks.length == words.length }
      slicesOk && denseOk && coverageOk
    })
  }

  test("hashSplit law: label function is pure in the key — equal keys, equal splits; fractions respected loosely") {
    val cutsGen = for {
      a <- Gen.choose(1, 98)
      b <- Gen.choose(a + 1, 99)
    } yield Seq("x" -> a, "y" -> b, "z" -> 100)
    check(Prop.forAll(cutsGen, Gen.choose(1, 40)) { (cuts, n) =>
      val rows = (1 to 200).map(i => (i.toLong, s"key-${i % n}"))
      val out = Relational.hashSplit(rows.toDF("id", "k"), "k", cuts)
        .select("k", "split").collect().map(r => (r.getString(0), r.getString(1)))
      // same key -> same split, always
      out.groupBy(_._1).values.forall(v => v.map(_._2).distinct.length == 1)
    }, cases = 8)
  }

  test("sequentialPack law: per-pack weight <= budget unless a single row overflows; ids contiguous") {
    val gen = for {
      n <- Gen.choose(1, 150)
      weights <- Gen.listOfN(n, Gen.choose(1L, 400L))
      budget <- Gen.choose(50L, 600L)
    } yield (weights, budget)
    check(Prop.forAll(gen) { case (weights, budget) =>
      val rows = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val packed = TextOps.sequentialPack(rows.toDF("id", "w"), "id", "w", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val byPack = packed.groupBy(_._3)
      val contiguity = byPack.values.forall { docs =>
        val ids = docs.map(_._1); ids.max - ids.min + 1 == ids.length }
      // a pack's weight BEFORE its last row is < budget (the last row may
      // overflow: contiguous-greedy never reorders to fill gaps)
      val budgetLaw = byPack.values.forall { docs =>
        docs.sortBy(_._1).init.map(_._2).sum < budget ||
          docs.sortBy(_._1).map(_._2).sum <= budget
      }
      val idsMonotone = packed.map(_._3).toSeq == packed.map(_._3).sorted.toSeq
      contiguity && budgetLaw && idsMonotone
    }, cases = 8)
  }

  test("repetitionStats law: counts equal a local reference for arbitrary corpora") {
    val docGen = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "xyz")))
    val corpusGen = Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, docGen))
    val n = 2
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = TextOps.repetitionStats(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      corpus.zipWithIndex.forall { case (ws, i) =>
        val grams = ws.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        val freq = grams.groupBy(identity).view.mapValues(_.size)
        out(i.toLong) == ((grams.size.toLong, freq.size.toLong,
          if (freq.isEmpty) 0L else freq.values.max.toLong))
      }
    }, cases = 8)
  }

  test("invertedIndex law: postings reconstruct the corpus term frequencies") {
    val docGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("t1", "t2", "t3", "t4", "q")))
    val corpusGen = Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, docGen))
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val idx = TextOps.invertedIndex(df, "doc_id", "text")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      // ground truth: per-term map of doc -> tf
      val truth = corpus.zipWithIndex
        .flatMap { case (ws, i) => ws.map(w => (w, i.toLong)) }
        .groupBy(_._1).view
        .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
      idx.forall { case (term, (df_, totalTf, postings)) =>
        val t = truth(term)
        val parsed = postings.split(",").map { p =>
          val Array(d, c) = p.split(":"); (d.toLong, c.toLong)
        }
        df_ == t.size && totalTf == t.values.sum &&
          parsed.toMap == t && parsed.map(_._1).toSeq == parsed.map(_._1).sorted.toSeq
      } && idx.length == truth.size
    }, cases = 8)
  }

  test("boilerplateCoverage law: bounds hold and common spans match ground truth") {
    val docGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("u", "v", "w")))
    val corpusGen = Gen.choose(2, 8).flatMap(k => Gen.listOfN(k, docGen))
    val (span, minDocs) = (3, 2)
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val spansOf = corpus.map(_.sliding(span).filter(_.length == span)
        .map(_.mkString(" ")).toSeq)
      val commonTruth = spansOf.zipWithIndex
        .flatMap { case (ss, i) => ss.distinct.map(s => (s, i)) }
        .groupBy(_._1).filter(_._2.size >= minDocs).keySet
      val out = TextOps.boilerplateCoverage(df, "doc_id", "text", span, minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      graft.CacheScope.release()
      corpus.indices.forall { i =>
        val (nSpans, nCommon) = out(i.toLong)
        nSpans == spansOf(i).size.toLong &&
          nCommon == spansOf(i).count(commonTruth).toLong &&
          nCommon <= nSpans
      }
    }, cases = 8)
  }

  test("TopKAgg laws: permutation-invariant, merge-commutative, equals sorted-take-k") {
    // pure aggregator laws — no Spark job needed; these are the properties
    // map-side combine silently depends on (arbitrary slice orders and
    // arbitrary merge trees must all yield the ground-truth top-k)
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 9L)))
    check(Prop.forAll(pairGen, Gen.choose(1, 6)) { (xs, k) =>
      val agg = new graft.functions.TopKAgg(k)
      val truth = xs.distinct.sorted.take(k) // lex order on (key, id)
      def run(items: Seq[(Long, Long)]) = items.foldLeft(agg.zero)(agg.reduce)
      val direct = agg.finish(run(xs)).toList
      val shuffled = agg.finish(run(scala.util.Random.shuffle(xs))).toList
      val (a, b) = xs.splitAt(xs.length / 2)
      val merged = agg.finish(agg.merge(run(a), run(b))).toList
      val mergedRev = agg.finish(agg.merge(run(b), run(a))).toList
      // duplicates collapse under the insert's !lt rejection only when at
      // capacity; below capacity dups persist — the engine path feeds
      // distinct (hash, id) pairs, so compare on distinct inputs
      val xsD = xs.distinct
      val directD = agg.finish(run(xsD)).toList
      directD == truth &&
        agg.finish(run(scala.util.Random.shuffle(xsD))).toList == truth &&
        merged == mergedRev && direct == shuffled
    }, cases = 40)
  }

  test("TopKPairsAgg laws: equals TopKAgg ground truth under any slice order, merge tree, and a serialize hop") {
    // the imperative Catalyst twin must be EXTENSIONALLY equal to the
    // typed Aggregator it replaces, including across its binary
    // serialization boundary (the shuffle path)
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 9L)))
    check(Prop.forAll(pairGen, Gen.choose(1, 6)) { (xs, k) =>
      val xsD = xs.distinct
      val truth = xsD.sorted.take(k)
      val proto = graft.catalyst.TopKPairsAgg(null, null, k)
      def run(items: Seq[(Long, Long)]): graft.catalyst.TopKPairsBuffer = {
        val b = new graft.catalyst.TopKPairsBuffer(k)
        items.foreach { case (key, p) => b.insert(key, p) }
        b
      }
      def out(b: graft.catalyst.TopKPairsBuffer): List[(Long, Long)] =
        (0 until b.size).map(i => (b.keys(i), b.payloads(i))).toList
      val direct = out(run(xsD))
      val shuffled = out(run(scala.util.Random.shuffle(xsD)))
      val (a, b2) = xsD.splitAt(xsD.length / 2)
      val merged = out(proto.merge(run(a), run(b2)))
      val mergedRev = out(proto.merge(run(b2), run(a)))
      val roundTrip = out(proto.merge(run(a),
        proto.deserialize(proto.serialize(run(b2)))))
      direct == truth && shuffled == truth &&
        merged == truth && mergedRev == truth && roundTrip == truth
    }, cases = 40)
  }

  test("topKPairs Column helper accepts non-long integrals (casts, never a mid-task ClassCastException)") {
    val df = (1 to 30).map(i => (i % 3, i, i * 7)).toDF("g", "rank_int", "id_int")
    val out = df.groupBy("g")
      .agg(graft.catalyst.TopKPairs.topKPairs(col("rank_int"), col("id_int"), 2).as("t"))
      .select(col("g"), explode(col("t")).as("e"))
      .collect().map(r => (r.getInt(0), r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))
    assert(out.length == 6 && out.forall { case (g, k, p) => p == k * 7 },
      s"int inputs must flow through the long buffer intact: ${out.toSeq}")
    // direct Expression construction with wrong types fails at ANALYSIS
    val err = intercept[Exception] {
      df.groupBy("g").agg(graft.catalyst.Cols.column(
        graft.catalyst.TopKPairsAgg(
          graft.catalyst.Cols.expression(col("rank_int")),
          graft.catalyst.Cols.expression(col("id_int")), 2).toAggregateExpression()))
        .collect()
    }
    assert(err.getMessage.contains("BIGINT") || err.getMessage.contains("DATATYPE"),
      s"expected an analysis-time type error, got: ${err.getMessage.take(200)}")
  }

  test("quantizeInt8 law: reconstruction error <= scale/2 for arbitrary vectors") {
    val vecGen = Gen.choose(2, 32).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 7.0f)))
    check(Prop.forAll(Gen.listOfN(5, vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "vec")
      Embeddings.quantizeInt8(df, "id", "vec").collect().forall { r =>
        val (scale, err) = (r.getDouble(2), r.getDouble(4))
        err <= scale / 2 + 1e-9
      }
    }, cases = 8)
  }

  test("splitSentences law: segmentation is lossless modulo whitespace; indices dense") {
    val normalGen: Gen[String] = for {
      n <- Gen.choose(1, 6)
      ws <- Gen.listOfN(n, wordGen)
      term <- Gen.oneOf(".", "!", "?", "!!", "?!", "")
    } yield ws.mkString(" ") + term
    // orphan terminator runs (an ellipsis opening a fragment) are their
    // own sentences — the branch that makes re-splitting reassembled
    // text lossless (the q127 composition depends on it)
    val sentGen: Gen[String] = Gen.frequency(
      4 -> normalGen, 1 -> Gen.oneOf("...", "!!", "?", "?!."))
    val docGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, sentGen))
    check(Prop.forAll(docGen) { sents =>
      val text = sents.mkString(" ")
      val rows = TextOps.splitSentences(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("sent_idx").collect()
        .map(r => (r.getInt(1), r.getString(2)))
      // losslessness: concatenating the sentences loses only whitespace
      val lossless = rows.map(_._2).mkString.replaceAll("\\s", "") ==
        text.replaceAll("\\s", "")
      val dense = rows.map(_._1).toSeq == rows.indices.toSeq
      val trimmed = rows.forall { case (_, s) => s == s.trim && s.nonEmpty }
      lossless && dense && trimmed
    })
  }

  test("sentenceChunks law: chunk concatenation == sentence concatenation; budget-floor boundaries") {
    val docGen = for {
      n <- Gen.choose(1, 10)
      sents <- Gen.listOfN(n, Gen.choose(1, 9).flatMap(m =>
        Gen.listOfN(m, wordGen).map(_.mkString(" ") + ".")))
      budget <- Gen.choose(2, 20)
    } yield (sents, budget)
    check(Prop.forAll(docGen) { case (sents, budget) =>
      val text = sents.mkString(" ")
      val chunks = TextOps.sentenceChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", budget.toLong)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(4)))
      // coverage in order, no sentence ever split across chunks
      val coverage = chunks.map(_._2).mkString(" ") == text
      // boundary law: a chunk's id is the floor of its first sentence's
      // cumulative-token offset (replay the prefix sum driver-side)
      val counts = sents.map(_.split(" ").length.toLong)
      val starts = counts.scanLeft(0L)(_ + _).init
      val expectIds = sents.indices.map(i => starts(i) / budget).distinct
      val idsOk = chunks.map(_._1).toSeq == expectIds
      coverage && idsOk
    })
  }

  test("cusum law: distributed prefix-min identity == the sequential max(0, S+d) recurrence") {
    val seriesGen = for {
      n <- Gen.choose(1, 60)
      vals <- Gen.listOfN(n, Gen.choose(-50L, 120L))
      target <- Gen.choose(0L, 40L)
      slack <- Gen.choose(0L, 10L)
      thr <- Gen.choose(1L, 80L)
    } yield (vals, target, slack, thr)
    check(Prop.forAll(seriesGen) { case (vals, target, slack, thr) =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (1L, i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L), v) }
      val got = Events.cusumChangepoints(rows.toDF("k", "eid", "t", "v"),
          "k", "t", "v", target, slack, thr, tiebreak = Seq(col("eid")))
        .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getInt(5)))).toMap
      // sequential reference: the textbook recurrence
      var sRef = 0L
      val want = vals.zipWithIndex.map { case (v, i) =>
        sRef = math.max(0L, sRef + (v - target - slack))
        i.toLong -> ((sRef, if (sRef > thr) 1 else 0))
      }.toMap
      got == want
    }, cases = 8)
  }

  test("associationRules law: counts and ppm metrics match a brute-force reference on random baskets") {
    val basketsGen = for {
      nGroups <- Gen.choose(2, 12)
      items <- Gen.listOfN(nGroups, Gen.choose(1, 5).flatMap(k =>
        Gen.pick(k, Seq("a", "b", "c", "d", "e"))))
    } yield items.map(_.toSet)
    check(Prop.forAll(basketsGen) { baskets =>
      val rows = baskets.zipWithIndex.flatMap { case (is, g) => is.map(i => (s"g$g", i)) }
      val got = Events.associationRules(rows.toDF("g", "i"), "g", "i")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      graft.CacheScope.release()
      val n = baskets.size.toLong
      val itemN = baskets.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = (for {
        a <- itemN.keys; b <- itemN.keys if a != b
        both = baskets.count(s => s.contains(a) && s.contains(b)).toLong
        if both >= 1
      } yield (a, b) -> ((both, itemN(a), itemN(b),
        both * 1000000L / itemN(a),
        both * n * 1000000L / (itemN(a) * itemN(b))))).toMap
      got == want
    }, cases = 8)
  }
}
