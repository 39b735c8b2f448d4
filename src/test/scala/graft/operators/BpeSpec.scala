package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent single-machine BPE reference (plain Maps, no Spark) —
    * the oracle the distributed trainer must reproduce exactly. */
  private def referenceTrain(corpus: Seq[String], numMerges: Int,
      minPairCount: Long): Seq[(Int, String, String, Long)] = {
    var words: Map[Seq[String], Long] = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toSeq :+ Bpe.EndMark) -> ws.size.toLong
      }
    val merges = collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        // max count, ties lexicographic on (left, right)
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minPairCount) done = true
        else {
          merges += ((rank, l, r, c))
          words = words.map { case (syms, f) => Bpe.applyMerge(syms, l, r) -> f }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  private val sennrich = Seq(
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest widest")

  test("bpeTrain reproduces the independent reference on the Sennrich-style corpus") {
    val docs = sennrich.toDF("text")
    val got = Bpe.bpeTrain(docs, "text", numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    val want = referenceTrain(sennrich, 10, 2L)
    assert(got == want, s"\ngot  $got\nwant $want")
    // the classic corpus learns "est</w>" early (newest+widest dominate)
    assert(got.take(3).map(m => m._2 + m._3).contains("est"))
  }

  test("bpeTrain determinism and early stop at minPairCount") {
    val docs = sennrich.toDF("text")
    val a = Bpe.bpeTrain(docs, "text", numMerges = 6, minPairCount = 3L).collect().toSeq
    val b = Bpe.bpeTrain(docs, "text", numMerges = 6, minPairCount = 3L).collect().toSeq
    assert(a == b)
    // every emitted merge respects the floor
    assert(a.forall(_.getLong(3) >= 3L))
    // a high floor exhausts before numMerges
    val few = Bpe.bpeTrain(docs, "text", numMerges = 50, minPairCount = 10L).count()
    assert(few < 50)
  }

  test("bpeEncodeWords round-trips and reproduces the training end state") {
    val docs = sennrich.toDF("text")
    val merges = Bpe.bpeTrain(docs, "text", numMerges = 10)
    val enc = Bpe.bpeEncodeWords(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // decode: concatenated subwords minus the marker reconstruct the word
    enc.foreach { case (w, subs) =>
      assert(subs.mkString("") == w + Bpe.EndMark, s"round-trip of '$w'")
    }
    // greedy encode under full merges = training end state: replay the
    // reference trainer and compare its final symbol table
    var words: Map[String, Seq[String]] =
      enc.keys.map(w => w -> (w.split("").toSeq :+ Bpe.EndMark)).toMap
    referenceTrain(sennrich, 10, 2L).foreach { case (_, l, r, _) =>
      words = words.map { case (w, syms) => w -> Bpe.applyMerge(syms, l, r) }
    }
    enc.foreach { case (w, subs) =>
      assert(subs == words(w), s"encode of '$w': $subs vs training state ${words(w)}")
    }
  }

  test("bpeEncode: more merges never increase the per-doc subword count") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").limit(100)
    val m0 = Bpe.bpeTrain(docs, "text", numMerges = 5)
    val m1 = Bpe.bpeTrain(docs, "text", numMerges = 20)
    def counts(m: org.apache.spark.sql.DataFrame) =
      Bpe.bpeEncode(docs, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val c0 = counts(m0)
    val c1 = counts(m1)
    assert(c0.keySet == c1.keySet && c0.nonEmpty)
    c0.foreach { case (id, (nw0, ns0)) =>
      val (nw1, ns1) = c1(id)
      assert(nw0 == nw1, s"doc $id word count must not depend on merges")
      assert(ns1 <= ns0, s"doc $id: 20-merge encode $ns1 > 5-merge $ns0")
      // marker-per-word lower bound: at least one subword per word
      assert(ns1 >= nw1)
    }
  }

  test("applyMerge handles overlapping runs left-to-right") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("x"), "a", "a") == Seq("x"))
  }
}
