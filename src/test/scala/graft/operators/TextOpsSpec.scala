package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: full coverage, correct overlap, short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "only four tokens here"),                   // < window
      (3L, (1 to 40).map(i => s"u$i").mkString(" ")))  // exactly window
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkTokens(docs, "doc_id", "text", window = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    // doc 1: nChunks = 1 + ceil((100-40)/30) = 3; starts 0,30,60 cover
    // tokens 1-40, 31-70, 61-100 — full coverage, last window full
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq == Seq(40, 40, 40))
    // chunk k starts at token 30k+1
    byDoc(1L).foreach { case (_, k, _, text) =>
      assert(text.split(" ").head == s"t${30 * k + 1}")
    }
    // consecutive chunks overlap by exactly 10 tokens
    val c0 = byDoc(1L).find(_._2 == 0).get._4.split(" ")
    val c1 = byDoc(1L).find(_._2 == 1).get._4.split(" ")
    assert(c0.takeRight(10).toSeq == c1.take(10).toSeq)
    assert(byDoc(2L).map(x => (x._2, x._3)).toSeq == Seq((0, 4)))
    assert(byDoc(3L).map(x => (x._2, x._3)).toSeq == Seq((0, 40)))
    // every token of doc 1 appears in some chunk (coverage)
    val covered = byDoc(1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"t$i").toSet)
  }

  test("sequentialPack: distributed prefix sum equals the single-partition ground truth") {
    // weights chosen so packs straddle partition boundaries; 997 is not a
    // power of two (exercises the exact floor-division path)
    val rows = (1 to 1000).map(i => (i.toLong, (i * 37 % 250 + 1).toLong))
    val df = rows.toDF("doc_id", "w").repartition(13) // scrambled input partitioning
    val packed = TextOps.sequentialPack(df, "doc_id", "w", budget = 997L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.length == 1000)
    // ground truth: sequential scan in id order
    var cum = 0L
    val truth = rows.sortBy(_._1).map { case (id, w) =>
      val pack = cum / 997L; cum += w; (id, w, pack)
    }
    assert(packed.sortBy(_._1).toSeq == truth,
      "distributed two-phase prefix sum must equal the sequential scan")
    // packs are contiguous in id order and weights fill the budget
    val byPack = truth.groupBy(_._3)
    byPack.values.foreach { docs =>
      val ids = docs.map(_._1)
      assert(ids.max - ids.min + 1 == ids.length, "packs must be contiguous id ranges")
    }
  }

  test("redactPii: replaces and counts emails and phones, leaves clean text intact") {
    val docs = Seq(
      (1L, "write to jane.doe+spam@corp.example.com or call 555-123-4567 today"),
      (2L, "no pii in this sentence at all"),
      (3L, "two mails a@b.io c%d@e-f.org and +1 phone +44-2079-4600 wait 123-4567-8901"))
      .toDF("doc_id", "text")
    val out = TextOps.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((1, 1, "write to [EMAIL] or call [PHONE] today")))
    assert(out(2L) == ((0, 0, "no pii in this sentence at all")))
    val (e3, p3, t3) = out(3L)
    assert(e3 == 2 && t3.contains("[EMAIL]") && !t3.contains("a@b.io"))
    assert(p3 >= 1 && t3.contains("[PHONE]"))
  }

  test("redactPii counts reconcile with redacted tokens when a phone hides inside an email") {
    val docs = Seq((1L, "reach me at 555-123-4567@corp.example.com now")).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs, "doc_id", "text").collect()(0)
    val (emails, phones, clean) = (r.getInt(1), r.getInt(2), r.getString(3))
    // the email swallows the digits: one [EMAIL], zero [PHONE] — and the
    // counts must say exactly that (phones counted post-email-redaction)
    assert(clean == "reach me at [EMAIL] now")
    assert(emails == 1 && phones == 0,
      s"counts ($emails, $phones) must reconcile with the redacted text")
  }

  test("repetitionStats: counts and fractions match hand-computed ground truth") {
    val docs = Seq(
      (1L, "a a a a"),        // bigrams: "a a" x3 -> total 3, distinct 1, top 3
      (2L, "x y z"),          // bigrams: "x y", "y z" -> total 2, distinct 2, top 1
      (3L, "solo"))           // < n tokens -> zero bigrams, NULL fractions
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "doc_id", "text", n = 2)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_ngrams", "n_distinct", "top_cnt", "dup_frac", "top_frac"))
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(m(1L) == ((3L, 1L, 3L, Some(1.0 - 1.0 / 3.0), Some(1.0))))
    assert(m(2L) == ((2L, 2L, 1L, Some(0.0), Some(0.5))))
    assert(m(3L) == ((0L, 0L, 0L, None, None)))
  }

  test("bm25Search: scores equal a local BM25 reference and rank by relevance") {
    val docs = Seq(
      (1L, "spark spark spark fills this document with spark mentions entirely"),
      (2L, "spark appears once among many other unrelated filler words here"),
      (3L, "nothing relevant lives in this document at all frankly speaking"),
      (4L, "hash hash spark"),
      (5L, "the rare term merge shows up exactly once right here today"))
      .toDF("doc_id", "text")
    val query = Seq("spark", "hash", "merge")
    val out = TextOps.bm25Search(docs, "doc_id", "text", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // local reference: same formula, same quantization
    val toks = Map(
      1L -> "spark spark spark fills this document with spark mentions entirely",
      2L -> "spark appears once among many other unrelated filler words here",
      3L -> "nothing relevant lives in this document at all frankly speaking",
      4L -> "hash hash spark",
      5L -> "the rare term merge shows up exactly once right here today")
      .map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = query.map(t => t -> toks.values.count(_.contains(t))).toMap
    def score(id: Long): (Long, Long) = {
      val dl = toks(id).size.toDouble
      val cs = query.flatMap { term =>
        val tf = toks(id).count(_ == term).toDouble
        if (tf == 0 || dfm(term) == 0) None
        else {
          val idf = math.log((n - dfm(term) + 0.5) / (dfm(term) + 0.5) + 1.0)
          val tfn = (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
          Some(math.round(1e6 * (idf * tfn)))
        }
      }
      (cs.sum, cs.size.toLong)
    }
    val expected = toks.keys.map(id => (id, score(id)._1, score(id)._2))
      .filter(_._3 > 0).toSeq.sortBy(t => (-t._2, t._1))
    assert(out.toSeq == expected, "engine scores must equal the local BM25 reference")
    // sanity on the ranking itself: doc 3 (no query terms) is absent
    assert(!out.exists(_._1 == 3L))
  }

  test("bm25ScoreBatch == bm25Search isin arm; oversized query dispatches to the batch arm") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val q = Seq("spark", "hash", "merge", "window")
    val isinArm = TextOps.bm25Search(docs, "doc_id", "text", q, k = 10)
    val batchArm = TextOps.bm25ScoreBatch(docs, "doc_id", "text",
      q.map(Tuple1(_)).toDF("term"), "term", k = 10)
    assert(isinArm.collect().toSeq == batchArm.collect().toSeq,
      "the two arms must produce identical scores and ranking")
    // past the cap, bm25Search must route to the batch arm: no persisted
    // prune (the isin arm's InMemoryTableScan) in the plan, still correct
    val big = q ++ (1 to TextOps.IsinQueryTermCap).map(i => s"zzterm$i")
    val dispatched = TextOps.bm25Search(docs, "doc_id", "text", big, k = 10)
    val p = dispatched.queryExecution.executedPlan.toString
    assert(!p.contains("InMemoryTableScan"),
      "oversized query should take the broadcast-terms arm, not the isin prune")
    // the zz-terms match nothing, so scores equal the 4-term run
    assert(dispatched.collect().toSeq == isinArm.collect().toSeq)
  }

  test("dedupParagraphs: first corpus occurrence survives, docs reassemble in order") {
    val docs = Seq(
      (1L, "unique one. shared para. tail one"),
      (2L, "shared para. unique two. shared para"), // cross-doc + in-doc repeat
      (3L, "shared para"))                          // fully duplicated doc
      .toDF("doc_id", "text")
    val got = TextOps.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("unique one. shared para. tail one", 3L, 3L)))
    assert(got(2L) == (("unique two", 3L, 1L)),
      "both copies of the shared para must drop (doc 1 owns it)")
    assert(got(3L) == (("", 1L, 0L)), "fully-duplicated doc comes back empty")
  }

  test("urlBlocklistFilter: exact host, subdomain, lookalike, case and userinfo spoofs") {
    val docs = Seq(
      (1L, "see https://a.bad.com/x and http://ok.org/y"),   // subdomain of bad.com
      (2L, "plain text no links at all"),
      (3L, "https://bad.com/root http://deep.sub.bad.com/z"), // apex + deep subdomain
      (4L, "https://notbad.com/x"),                           // lookalike must NOT match
      (5L, "http://ok.org/a https://ok.org/b"),
      (6L, "HTTPS://BAD.COM/SHOUT"),                          // DNS is case-insensitive
      (7L, "https://innocent.org@bad.com/x"),                 // userinfo can't spoof the host
      (8L, "go to https://bad.com. Next sentence here."),     // sentence-final URL
      (9L, "https://bad.com.evil.org/x"))                     // prefix lookalike must NOT match
      .toDF("doc_id", "text")
    val got = TextOps.urlBlocklistFilter(docs, "doc_id", "text", Seq("Bad.COM"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((2, 1, false)))
    assert(got(2L) == ((0, 0, true)))
    assert(got(3L) == ((2, 2, false)))
    assert(got(4L) == ((1, 0, true)), "suffix match must be dot-anchored")
    assert(got(5L) == ((2, 0, true)))
    assert(got(6L) == ((1, 1, false)), "uppercase URL must still be caught")
    assert(got(7L) == ((1, 1, false)), "the host AFTER the userinfo is the real one")
    assert(got(8L) == ((1, 1, false)),
      "the sentence period must not ride into the host — 'bad.com.' escaped the blocklist")
    assert(got(9L) == ((1, 0, true)), "blocked domain as a host PREFIX is a different host")
    intercept[IllegalArgumentException] {
      TextOps.urlBlocklistFilter(docs, "doc_id", "text", Seq("bad.com", " "))
    }
  }

  test("invertedIndex: postings sorted by doc id, df/total_tf full-corpus, cap truncates") {
    val docs = Seq(
      (3L, "b a b"),   // b:2, a:1
      (1L, "a b c"),
      (2L, "a a c"))
      .toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx("a") == ((3L, 4L, "1:1,2:2,3:1")))
    assert(idx("b") == ((2L, 3L, "1:1,3:2")))
    assert(idx("c") == ((2L, 2L, "1:1,2:1")))
    // minDf drops terms; the cap truncates postings but NOT df/total_tf
    val capped = TextOps.invertedIndex(docs, "doc_id", "text", minDf = 3, maxPostings = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(capped == Map("a" -> ((3L, 4L, "1:1,2:2"))))
  }

  test("corpusProfile: totals, mean and exact percentiles per stratum") {
    val docs = Seq(
      ("s1", "en", "one two three"),        // 3 tokens, 13 chars
      ("s1", "en", "four five"),            // 2 tokens, 9 chars
      ("s1", "en", "six seven eight nine"), // 4 tokens, 20 chars
      ("s2", "de", "zehn"))                 // 1 token, 4 chars
      .toDF("source", "lang", "text")
    val prof = TextOps.corpusProfile(docs, Seq("source", "lang"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // s1/en: p50 of (2,3,4) = 3; p90 = 2 + 0.9*2 = 3.8 (linear interpolation)
    assert(prof(("s1", "en")) == ((3L, 9L, 42L, 14.0, 3.0, 3.8)))
    assert(prof(("s2", "de")) == ((1L, 1L, 4L, 4.0, 1.0, 1.0)))
  }

  test("corpusProfile approx path: bounded-state percentiles land in the exact rank window") {
    val docs = (1 to 400).map(i => ("s", s"doc$i " + (1 to (i % 50 + 1)).map(j => s"w$j").mkString(" ")))
      .toDF("source", "text")
    val approx = TextOps.corpusProfile(docs, Seq("source"), "text", exactPercentiles = false)
      .collect()(0)
    val counts = docs.select(size(split(trim(col("text")), "\\s+")).cast("double"))
      .collect().map(_.getDouble(0)).sorted
    def rankWindow(p: Double, v: Double): Boolean = {
      val target = p * counts.length
      val lo = counts(math.max(0, (target - 2).toInt)) // eps at accuracy 10k << 1 rank here
      val hi = counts(math.min(counts.length - 1, (target + 2).toInt))
      v >= lo && v <= hi
    }
    assert(rankWindow(0.5, approx.getDouble(5)), s"p50 ${approx.getDouble(5)} outside rank window")
    assert(rankWindow(0.9, approx.getDouble(6)), s"p90 ${approx.getDouble(6)} outside rank window")
    // totals identical to the exact path (only the percentile sketch differs)
    val exact = TextOps.corpusProfile(docs, Seq("source"), "text").collect()(0)
    assert(approx.getLong(1) == exact.getLong(1) && approx.getLong(2) == exact.getLong(2))
  }

  test("normalizeText: case, punctuation and whitespace canonicalized; original kept") {
    val docs = Seq(
      (1L, "  The QUICK!! Brown-Fox;  jumps\t42 "),
      (2L, "already clean text"),
      (3L, "!!!")) // punctuation-only collapses to empty
      .toDF("doc_id", "text")
    val out = TextOps.normalizeText(docs, "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._2 == "the quick brown fox jumps 42")
    assert(out(2L)._2 == "already clean text")
    assert(out(3L)._2 == "")
    assert(out(1L)._1.contains("QUICK"), "original column must be preserved")
  }

  test("degenerate inputs: no query hits, no repeated spans, single-token docs") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta")).toDF("doc_id", "text")
    // BM25 with zero matching terms: empty result, not an error
    assert(TextOps.bm25Search(docs, "doc_id", "text", Seq("zz", "qq"), k = 5).count() == 0)
    // no span occurs in >= 2 docs
    assert(TextOps.repeatedSpans(docs, "doc_id", "text", span = 2, minDocs = 2).count() == 0)
    // single-token doc: zero spans, zero common, NULL coverage
    val cov = TextOps.boilerplateCoverage(docs, "doc_id", "text", span = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.isNullAt(3)))).toMap
    assert(cov(2L) == ((0L, 0L, true)))
    // inverted index on a term appearing once with minDf=2: filtered out
    assert(TextOps.invertedIndex(docs, "doc_id", "text", minDf = 2).count() == 0)
    // profile over one stratum column with one doc per stratum
    val prof = TextOps.corpusProfile(docs, Seq("doc_id"), "text").collect()
    assert(prof.length == 2)
  }

  test("repeatedSpans and boilerplateCoverage agree on injected boilerplate") {
    val boiler = "click here to subscribe now"
    val docs = (1 to 30).map { i =>
      val body = (1 to 10).map(j => s"w${i}_$j").mkString(" ") // unique per doc
      (i.toLong, if (i <= 20) s"$body $boiler" else body)
    }.toDF("doc_id", "text")
    val spans = TextOps.repeatedSpans(docs, "doc_id", "text", span = 5, minDocs = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the only 5-token span shared by >= 10 docs is the boilerplate itself
    assert(spans.toSeq == Seq((boiler, 20L, 20L)))
    val cov = TextOps.boilerplateCoverage(docs, "doc_id", "text", span = 5, minDocs = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // boilerplated docs: 15 tokens -> 11 spans, 1 common; clean docs: 10 -> 6 spans, 0
    (1 to 20).foreach { i =>
      assert(cov(i.toLong) == ((11L, 1L, Some(1.0 / 11.0))), s"doc $i")
    }
    (21 to 30).foreach { i =>
      assert(cov(i.toLong) == ((6L, 0L, Some(0.0))), s"doc $i")
    }
  }

  test("stripRepeatedSpans: boilerplate tokens removed, unique bodies untouched") {
    val boiler = "follow us for updates and subscribe to the newsletter now"
    val docs = (1 to 30).map { i =>
      val body = (1 to 10).map(j => s"w${i}_$j").mkString(" ")
      i.toLong -> (i match {
        case _ if i <= 20 => s"$body $boiler" // 10 unique + 10 boiler tokens
        case 21           => boiler           // fully boilerplate
        case _            => body             // clean
      })
    }.toDF("doc_id", "text")
    val out = TextOps.stripRepeatedSpans(docs, "doc_id", "text",
        span = 5, minDocs = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    graft.CacheScope.release()
    (1 to 20).foreach { i =>
      val (clean, n, k) = out(i.toLong)
      assert(n == 20L && k == 10L, s"doc $i counts: $n/$k")
      assert(clean == (1 to 10).map(j => s"w${i}_$j").mkString(" "),
        s"doc $i must keep exactly its unique body")
    }
    // the all-boilerplate doc empties; its windows are the same common ones
    assert(out(21L) == (("", 10L, 0L)))
    (22 to 30).foreach { i =>
      val (clean, n, k) = out(i.toLong)
      assert(n == 10L && k == 10L && clean.nonEmpty, s"clean doc $i modified")
    }
  }

  test("ngramLmScoreWith: frozen model scores unseen vocabulary at the add-α law") {
    // train: N=4, V={a,b}, uni a:2 b:2, bi (a,b):2 (b,a):1
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a z"), (11L, "z q")).toDF("doc_id", "text")
    val a = 0.5
    def m(c: Double, den: Double) =
      math.round(1e6 * -math.log((c + a) / (den + a * 2.0)))
    val out = TextOps.ngramLmScoreWith(score, train, "doc_id", "text",
        alpha = a, keepMaxMicroPerToken = Long.MaxValue / 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CacheScope.release()
    // doc 10: seen first 'a' → m(2,4); unseen bigram (a,z), seen prev a → m(0,2)
    assert(out(10L) == ((2L, m(2, 4) + m(0, 2))))
    // doc 11: everything unseen → m(0,4) first, m(0,0) = ln V for the bigram
    assert(out(11L) == ((2L, m(0, 4) + m(0, 0))))
    assert(m(0, 0) == math.round(1e6 * math.log(2.0)), "P(unseen|unseen) = 1/V")
  }

  test("ngramLmScore: hand-computed add-α bigram NLL on a 3-doc corpus") {
    // corpus: N=7 tokens, V={a,b,c}, uni a:3 b:3 c:1; bigrams (a,b):3 (b,a):1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val a = 0.5
    // the operator's exact expression shape: (c+α)/(den+α·V), one division
    def m(c: Double, den: Double) =
      math.round(1e6 * -math.log((c + a) / (den + a * 3.0)))
    val pFirstA = m(3, 7); val pFirstC = m(1, 7) // den = N for first tokens
    val pAB = m(3, 3); val pBA = m(1, 3)         // den = c(prev)
    val expected = Map(
      1L -> (4L, pFirstA + pAB + pBA + pAB),
      2L -> (2L, pFirstA + pAB),
      3L -> (1L, pFirstC))
    // budget between doc 2's mean (lowest: common transitions) and doc 3's
    // (highest: rare unigram) — both keep classes populated
    val tau = (expected(2L)._2 / 2 + expected(3L)._2) / 2
    val out = TextOps.ngramLmScore(docs, "doc_id", "text", alpha = a,
      keepMaxMicroPerToken = tau)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    graft.CacheScope.release()
    expected.foreach { case (id, (n, nll)) =>
      assert(out(id)._1 == n, s"doc $id n_tokens")
      assert(out(id)._2 == nll, s"doc $id nll_micro")
      assert(out(id)._3 == (nll <= tau * n), s"doc $id keep")
    }
    assert(out(2L)._3 && !out(3L)._3, "budget must split the corpus")
  }

  test("tfidfKeywords: hand-computed smoothed tf-idf, top-k per doc, term tie-break") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian"))
      .toDF("doc_id", "text")
    def micro(tf: Long, df: Long): Long =
      math.round(1e6 * tf * (math.log(4.0 / (df + 1.0)) + 1.0)) // N = 3
    val out = TextOps.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    graft.CacheScope.release()
    val byDoc = out.groupBy(_._1)
    // doc 1: apple tf=2 df=1 outranks banana tf=1 df=2
    assert(byDoc(1L).sortBy(-_._5).map(_._2).toSeq == Seq("apple", "banana"))
    assert(byDoc(1L).find(_._2 == "apple").get._5 == micro(2, 1))
    assert(byDoc(1L).find(_._2 == "banana").get._5 == micro(1, 2))
    // doc 2: rarer cherry outranks corpus-common banana
    assert(byDoc(2L).sortBy(-_._5).map(_._2).toSeq == Seq("cherry", "banana"))
    // doc 3: fewer terms than k — report what exists
    assert(byDoc(3L).map(_._2).toSeq == Seq("durian"))
    assert(out.forall { case (_, _, tf, df, _) => tf >= 1 && df >= 1 })
  }

  test("dsirScore: target-affine docs rank first; sub-bigram docs never selected") {
    val target = Seq(
      (100L, "zebra quagga zebra quagga"),
      (101L, "zebra quagga stripes"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "zebra quagga zebra"),   // two target-heavy bigrams
      (2L, "apple banana cherry"),  // bigrams the target never emits
      (3L, "quagga stripes"),       // one target bigram
      (4L, "solo"),                 // single token: no features
      (5L, "apple banana"))
      .toDF("doc_id", "text")
    val out = TextOps.dsirScore(raw, target, "doc_id", "text",
      buckets = 64, lambda = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheScope.release()
    assert(out.length == 3, "k cap")
    assert(out.head._1 == 1L, "the most target-affine doc must rank first")
    assert(out.head._2 == 2L, "n_grams = tokens - 1")
    assert(!out.map(_._1).contains(4L), "a featureless doc cannot be selected")
    val scores = out.map(x => x._1 -> x._3).toMap
    assert(scores(1L) > scores.getOrElse(2L, Long.MinValue),
      "target bigrams must outscore never-seen bigrams")
    // deterministic
    val again = TextOps.dsirScore(raw.repartition(7), target, "doc_id", "text",
      buckets = 64, lambda = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheScope.release()
    assert(out.toSeq == again.toSeq)
    // Gumbel resample: seeded draw — deterministic across partitionings;
    // at vanishing temperature the sample converges to the top-k set
    // (noise in micro units rounds to ~0 next to the score gaps)
    def sample(df: org.apache.spark.sql.DataFrame, temp: Double): Seq[Long] = {
      val s = TextOps.dsirScore(df, target, "doc_id", "text",
        buckets = 64, lambda = 1.0, k = 3, gumbelTemp = temp)
        .collect().map(_.getLong(0)).toSeq
      graft.CacheScope.release()
      s
    }
    assert(sample(raw, 2.0) == sample(raw.repartition(5), 2.0),
      "the seeded Gumbel draw must not depend on partitioning")
    assert(sample(raw, 1e-9).toSet == out.map(_._1).toSet,
      "tau -> 0 must recover the deterministic top-k")
  }

  test("unigramDrift: zero drift for a group that IS the corpus; drift orders by skew") {
    import spark.implicits._
    // one group == whole corpus -> p_g == p_c exactly -> KL = TV = 0
    val uniform = (1 to 200).map(i => ("only", s"tok${i % 40} tok${(i * 7) % 40}"))
      .toDF("grp", "text")
    val zero = TextOps.unigramDrift(uniform, "grp", "text", buckets = 64)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    graft.CacheScope.release()
    assert(zero.head == ((0L, 0L)), s"single-group drift must be exactly zero, got ${zero.head}")
    // a group drawing from a disjoint vocabulary drifts further than one
    // drawing from the shared vocabulary
    val mixed = ((1 to 300).map(i => ("base", s"tok${i % 40}")) ++
      (1 to 60).map(i => ("near", s"tok${i % 40}")) ++
      (1 to 60).map(i => ("far", s"alien${i % 40}")))
      .toDF("grp", "text")
    val kl = TextOps.unigramDrift(mixed, "grp", "text", buckets = 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    graft.CacheScope.release()
    assert(kl("far") > kl("near"),
      s"disjoint vocab must out-drift shared vocab: $kl")
    assert(kl.values.forall(_ >= 0L),
      s"smoothed KL against the containing mixture must be non-negative: $kl")
    intercept[IllegalArgumentException] {
      TextOps.unigramDrift(mixed, "grp", "text", buckets = 1)
    }
  }

  test("nbTrainScore: disjoint-vocab classes recovered exactly; margins positive; smoothing exact") {
    import spark.implicits._
    val train = ((1 to 30).map(i => (i.toLong, s"apple fruit sweet apple t$i", "food")) ++
      (1 to 30).map(i => (i.toLong + 100, s"engine piston torque diesel t$i", "cars")))
      .toDF("id", "text", "label")
    val score = Seq(
      (900L, "apple sweet apple"), (901L, "torque diesel engine piston"),
      (902L, "apple piston")) // mixed doc: 1 food token vs 1 cars token + priors tie
      .toDF("id", "text")
    val out = TextOps.nbTrainScore(train, score, "id", "text", "label")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(900L)._1 == "food" && out(901L)._1 == "cars")
    assert(out(900L)._3 > 0 && out(901L)._3 > 0, "clear-cut docs must carry positive margins")
    // hand-check the smoothed law on the mixed doc: per-class posts are
    // computable exactly (equal priors, equal class totals by construction)
    val nt = 30L * 5 // tokens per class
    val v = train.select(explode(split(col("text"), " "))).distinct().count()
    def llMicro(c: Long) = math.round(1e6 * math.log((c + 1.0) / (nt + v.toDouble)))
    // doc 902: "apple"(food 60, cars 0) + "piston"(food 0, cars 30)
    val prior = math.round(1e6 * math.log(0.5))
    val postFood = prior + llMicro(60) + llMicro(0)
    val postCars = prior + llMicro(0) + llMicro(30)
    val expectedLbl = if (postCars > postFood) "cars" else "food"
    assert(out(902L)._1 == expectedLbl && out(902L)._2 == math.max(postFood, postCars),
      s"mixed doc must score exactly the smoothed law: got ${out(902L)}, " +
        s"expected ($expectedLbl, ${math.max(postFood, postCars)})")
    assert(out(902L)._3 == math.abs(postFood - postCars))
  }

  test("winnowing: lifted-passage guarantee, density bound, short docs silent") {
    val (k, w) = (3, 4)
    // doc 2 lifts a 6-token run (= w + k - 1) from doc 1 into otherwise
    // disjoint text -> the winnowing guarantee promises >= 1 shared print
    val passage = "the quick brown fox jumps high"
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon zeta eta theta"),
      (2L, s"one two three four $passage five six seven eight nine"),
      (3L, "completely unrelated text with nothing shared at all here today"),
      (4L, "too short")) // < w k-grams -> no fingerprints by contract
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byDoc.contains(4L), "a doc with fewer than w k-grams must emit nothing")
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "docs sharing a w+k-1 token run must share a fingerprint (the winnowing guarantee)")
    assert((byDoc(3L) & (byDoc(1L) ++ byDoc(2L))).isEmpty,
      "disjoint text must not collide at this scale")
    // density: winnowing keeps ~2/(w+1) of positions, far below all grams
    val nGrams1 = docs.filter(col("doc_id") === 1L)
      .select(size(split(trim(col("text")), "\\s+"))).head().getInt(0) - k + 1
    assert(byDoc(1L).size < nGrams1,
      s"fingerprints (${byDoc(1L).size}) must be sparser than grams ($nGrams1)")
    // the pair sweep surfaces exactly the planted pair at minShared = 1
    val pairs = TextOps.winnowOverlapPairs(docs, "doc_id", "text", k, w, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheScope.release()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("winnowIncremental == the cross-(increment, history) slice; store text never needed") {
    val docs = graft.Tables.documents(spark, sf)
    val (k, w, ms) = (3, 4, 2)
    val store = TextOps.winnowFingerprints(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", k, w)
    val got = TextOps.winnowIncremental(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        store, "doc_id", "fingerprint", k, w, ms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: the full-corpus fingerprint table, cross-sliced
    val all = TextOps.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheScope.release()
    val byDoc = all.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      (inc, incF) <- byDoc if inc % 10 == 0
      (hist, histF) <- byDoc if hist % 10 != 0
      shared = (incF & histF).size if shared >= ms
    } yield (inc, hist, shared.toLong)).toSet
    assert(got == expected,
      "incremental-vs-store must equal the cross slice of the full fingerprint table")
    assert(got.nonEmpty, "the gate corpus is known to contain cross-slice overlaps")
  }

  test("nbScoreWith (frozen wide model) == nbTrainScore on the gate corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val sp = graft.operators.Relational.hashSplit(docs, "text",
      Seq("train" -> 80, "rest" -> 100))
    val train = sp.filter(col("split") === "train")
    val held = sp.filter(col("split") =!= "train")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val joint = rows(TextOps.nbTrainScore(train, held, "doc_id", "text", "lang"))
    val model = TextOps.nbTrain(train, "text", "lang")
    val frozen = rows(TextOps.nbScoreWith(held, "doc_id", "text", model))
    graft.CacheScope.release()
    assert(frozen == joint,
      "the frozen wide-pivot model must reproduce the joint-plan scores bit-for-bit")
    // single-class degenerate: prediction trivial, margin null — on BOTH
    // paths (the joint plan's unguarded element_at(_, 2) THREW under ANSI
    // mode before the guard; found in review)
    import spark.implicits._
    val trainOne = Seq((1L, "alpha beta", "only")).toDF("id", "text", "label")
    val scoreOne = Seq((5L, "alpha beta")).toDF("id", "text")
    val one = TextOps.nbScoreWith(scoreOne, "id", "text",
      TextOps.nbTrain(trainOne, "text", "label")).collect()(0)
    val oneJoint = TextOps.nbTrainScore(trainOne, scoreOne, "id", "text", "label")
      .collect()(0)
    graft.CacheScope.release()
    assert(one.getString(1) == "only" && one.isNullAt(3))
    assert(oneJoint.getString(1) == "only" && oneJoint.isNullAt(3),
      "the joint plan must return the documented null margin, not an ANSI error")
  }

  test("htmlToText: script/style die with content, tags strip, entities decode in safe order") {
    val docs = Seq(
      (1L, "<html><HEAD><title>T</title><STYLE>p{color:red}</STYLE>" +
        "<script>if (a < b) { x(\"y\"); }</script></HEAD>" +
        "<body><!-- secret --><p>Hello   <b>world</b></p></body></html>"),
      (2L, "A &amp;lt;escaped&amp;gt; and &lt;real&gt; &quot;q&quot; &#39;s&#39;&nbsp;B &amp; C"),
      (3L, "no markup at all"),
      (4L, "<script src=\"x.js\">var a=1;</script>before<br/>after")
    ).toDF("doc_id", "text")
    val out = TextOps.htmlToText(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // script content (with its embedded '<'), style content, and the
    // comment are all gone; title and body text survive
    assert(out(1L) == "T Hello world")
    // entity decode runs AFTER tag strip with &amp; LAST: the double
    // escape yields the literal entity, never a resurrected tag
    assert(out(2L) == "A &lt;escaped&gt; and <real> \"q\" 's' B & C")
    assert(out(3L) == "no markup at all")
    assert(out(4L) == "before after")
  }

  test("splitSentences: terminator runs stick, fragments kept, empties dropped, indices contiguous") {
    val docs = Seq(
      (1L, "One. Two!! Three?No spaces needed. tail frag"),
      (2L, "   "),  // whitespace only: its single segment trims to empty
      (3L, "!!!"),  // orphan terminator run: its OWN sentence (lossless rule)
      (4L, "only one")
    ).toDF("doc_id", "text")
    val out = TextOps.splitSentences(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq ==
      Seq("One.", "Two!!", "Three?", "No spaces needed.", "tail frag"))
    assert(d1.map(_._2).toSeq == (0 until 5), "indices contiguous over KEPT sentences")
    assert(d1.map(_._4).toSeq == d1.map(_._3.length).toSeq)
    assert(!out.exists(_._1 == 2L), "whitespace-only docs emit no rows")
    assert(out.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq == Seq((0, "!!!")),
      "a terminator run with no content is a sentence — dropping it would " +
        "make segmentation lossy and desynchronize re-splits of reassembled text")
    assert(out.filter(_._1 == 4L).map(t => (t._2, t._3)).toSeq == Seq((0, "only one")))
  }

  test("sentenceChunks: whole sentences only, budget-floor assignment, full ordered coverage") {
    // sentences of 3 tokens each; budget 7 => cum-before 0,3,6 | 9,12 | 15:
    // chunks of 3, 2, and 1 sentences (floor(cb/7) = 0,0,0,1,1,2)
    val docs = Seq(
      (1L, "a1 a2 a3. b1 b2 b3! c1 c2 c3? d1 d2 d3. e1 e2 e3. f1 f2 f3"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10. short tail")  // 10-token sentence overflows its chunk
    ).toDF("doc_id", "text")
    val out = TextOps.sentenceChunks(docs, "doc_id", "text", budget = 7L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(t => (t._2, t._4, t._5)).toSeq == Seq((0L, 3L, 9L), (1L, 2L, 6L), (2L, 1L, 3L)))
    assert(d1.head._3 == "a1 a2 a3. b1 b2 b3! c1 c2 c3?")
    // reassembled chunks cover the doc in order with no sentence split
    assert(d1.map(_._3).mkString(" ") ==
      "a1 a2 a3. b1 b2 b3! c1 c2 c3? d1 d2 d3. e1 e2 e3. f1 f2 f3")
    // the 10-token sentence keeps chunk 0 alone (overflow, not split);
    // the tail starts at cb=10 -> chunk 1
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(t => (t._2, t._3)).toSeq ==
      Seq((0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10."), (1L, "short tail")))
  }

  test("dedupSentences: first (doc, idx) owner wins across AND within docs; terminators distinguish") {
    val docs = Seq(
      (1L, "Alpha beta. Shared one! Gamma."),
      (2L, "Shared one! Delta. Shared one! Epsilon."),  // cross-doc dup + within-doc dup
      (3L, "Shared one. Zeta."),                        // '.' vs '!': DIFFERENT sentence, kept
      (4L, "Alpha beta. Shared one! Gamma.")            // fully duplicate doc -> empty
    ).toDF("doc_id", "text")
    val out = TextOps.dedupSentences(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("Alpha beta. Shared one! Gamma.", 3L, 3L)))
    // doc 2 loses BOTH copies of the doc-1-owned sentence
    assert(out(2L) == (("Delta. Epsilon.", 4L, 2L)))
    // the period variant is a distinct unit and survives
    assert(out(3L) == (("Shared one. Zeta.", 2L, 2L)))
    assert(out(4L) == (("", 3L, 0L)))
  }

  test("splitSentences: CJK terminator set segments multilingual text; metachars escape safely") {
    val docs = Seq(
      (1L, "\u4e00\u53e5\u8bdd\u3002\u7b2c\u4e8c\u53e5\uff01Mixed latin. \u7b2c\u4e09\uff1f"),
      (2L, "a-b]c^d. next")  // '-', ']', '^' as ORDINARY text chars
    ).toDF("doc_id", "text")
    val cjk = TextOps.splitSentences(docs, "doc_id", "text",
      terminators = TextOps.CjkTerminators).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(cjk.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("\u4e00\u53e5\u8bdd\u3002", "\u7b2c\u4e8c\u53e5\uff01", "Mixed latin.", "\u7b2c\u4e09\uff1f"))
    // a terminator set containing class metacharacters must not corrupt
    // the pattern: ']', '^', '-' pass through as literals
    val meta = TextOps.splitSentences(docs, "doc_id", "text",
      terminators = ".]^-").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(meta.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq ==
      Seq("a-", "b]", "c^", "d.", "next"))
  }

  test("rougeScores: hand-computed clipped multiset counts, zero-overlap pairs kept at 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"), // unigram counts: the:2 cat sat on mat (6 total)
      (2L, "the cat on the mat"),     // the:2 cat on mat (5 total)
      (3L, "zebra")                   // 1 unigram, 0 bigrams
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = TextOps.rougeScores(docs, "doc_id", "text", pairs, "id_a", "id_b", Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("rouge1_p_micro"), r.getAs[Long]("rouge1_r_micro"),
         r.getAs[Long]("rouge1_f_micro"), r.getAs[Long]("rouge2_p_micro"),
         r.getAs[Long]("rouge2_r_micro"), r.getAs[Long]("rouge2_f_micro"))).toMap
    graft.CacheScope.release()
    // clipped unigrams (1,2): the:2 cat:1 on:1 mat:1 = 5 of cand 6 / ref 5
    // clipped bigrams: "the cat","on the","the mat" = 3 of cand 5 / ref 4
    assert(out((1L, 2L)) == (833333L, 1000000L, 909090L, 600000L, 750000L, 666666L))
    // zero overlap: pair survives with all-zero scores (ref has no bigrams at all)
    assert(out((1L, 3L)) == (0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("bleuScores: hand-computed clipped precisions, brevity penalty, geometric mean") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat the cat"),  // candidate: the:2 cat:2; bigrams: "the cat":2 "cat the":1
      (2L, "the cat"),          // reference: the:1 cat:1; "the cat":1
      (3L, "dog"),              // short candidate for the BP arm
      (4L, "a dog ran far"),    // longer reference
      (5L, "zebra quagga")      // zero overlap
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val out = TextOps.bleuScores(docs, "doc_id", "text", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("bleu1_p_micro"), r.getAs[Long]("bleu2_p_micro"),
          r.getAs[Long]("bp_micro"), r.getAs[Long]("bleu2_micro")))).toMap
    graft.CacheScope.release()
    // (1,2): clipped m1 = min(2,1)+min(2,1) = 2 of 4; m2 = 1 of 3;
    // c=4 >= r=2 so BP=1; bleu = sqrt(0.5 * 1/3) = 0.408248...
    assert(out((1L, 2L)) == ((500000L, 333333L, 1000000L,
      math.round(1e6 * math.sqrt(0.5 / 3.0)))), out)
    // (3,4): candidate 1 token ('dog', which the reference contains):
    // p1 = 1/1 but the candidate has NO bigrams (ta2 = 0) -> bleu 0;
    // BP = exp(1 - 4/1) = e^-3 reported on its own
    assert(out((3L, 4L)) == ((1000000L, 0L,
      math.round(1e6 * math.exp(1.0 - 4.0)), 0L)), out)
    // (1,5): zero overlap, candidate longer -> BP 1, everything else 0
    assert(out((1L, 5L)) == ((0L, 0L, 1000000L, 0L)), out)
  }

  test("chrfScores: hand-computed per-order means and F-beta") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abc ab"),   // chars "abcab": 1g a:2 b:2 c:1 (5); 2g ab:2 bc:1 ca:1 (4)
      (2L, "abc"),      // chars "abc":   1g a,b,c (3); 2g ab, bc (2)
      (3L, "xy"),       // no overlap with 1
      (4L, "a")         // single char: NO 2-grams
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 2L)).toDF("id_a", "id_b")
    val out = TextOps.chrfScores(docs, "doc_id", "text", pairs, "id_a", "id_b", maxN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("chrf_p_micro"), r.getAs[Long]("chrf_r_micro"),
          r.getAs[Long]("chrf_micro")))).toMap
    graft.CacheScope.release()
    // (1,2): m1=3 ta1=5 tb1=3; m2=2 ta2=4 tb2=2
    //   P=(3/5+2/4)/2=0.55  R=(1+1)/2=1.0  F2=5*0.55*1/(4*0.55+1)=0.859375
    assert(out((1L, 2L)) == ((550000L, 1000000L, 859375L)), out)
    // (1,3): zero overlap everywhere
    assert(out((1L, 3L)) == ((0L, 0L, 0L)), out)
    // (4,2): candidate "a": m1=1 ta1=1; no 2-grams on the candidate side
    //   P=(1/1+0)/2=0.5  R=(1/3+0)/2=1/6  F2=5*0.5*(1/6)/(4*0.5+1/6)
    val p = 0.5; val r = (1.0 / 3.0 + 0.0) / 2.0
    val f = 5.0 * p * r / (4.0 * p + r)
    assert(out((4L, 2L)) == ((500000L, math.round(1e6 * r), math.round(1e6 * f))), out)
  }

  test("tokenF1Scores: exact integer P/R/F1 and normalized exact-match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat"),
      (3L, "the  cat sat "),  // whitespace-normalizes equal to doc 1
      (4L, "dog")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = TextOps.tokenF1Scores(docs, "doc_id", "text", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("f1_p_micro"), r.getAs[Long]("f1_r_micro"),
          r.getAs[Long]("f1_micro"), r.getAs[Int]("exact")))).toMap
    graft.CacheScope.release()
    // (1,2): m=2 ta=3 tb=2 -> p=666666 r=1e6 f1=4e6 div 5=800000
    assert(out((1L, 2L)) == ((666666L, 1000000L, 800000L, 0)), out)
    assert(out((1L, 3L)) == ((1000000L, 1000000L, 1000000L, 1)),
      "whitespace runs must not break exact match")
    assert(out((1L, 4L)) == ((0L, 0L, 0L, 0)), out)
  }

  test("tokenF1Micro scalar agrees with the relational pair operator") {
    import spark.implicits._
    // hand values first
    // NOTE split(trim('')) is [''] in BOTH engines — two empty strings
    // are the SAME one-empty-token sequence, so their F1 is 1.0
    val hand = Seq(("the cat sat", "the cat"), ("", ""), ("a", "b"))
      .toDF("a", "b")
      .select(graft.functions.TextFunctions.tokenF1Micro(col("a"), col("b")).as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(hand == Seq(800000L, 1000000L, 0L), hand)
    // law: scalar(a_text, b_text) == pair-operator f1 on adjacent-id pairs
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").limit(300)
    val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
    val rel = TextOps.tokenF1Scores(docs, "doc_id", "text", pairs, "id_a", "id_b")
      .select(col("id_a"), col("f1_micro"))
    val sc = docs.select(col("doc_id").as("id_a"), col("text").as("_ta"))
      .join(docs.select((col("doc_id") - 1).as("id_a"), col("text").as("_tb")), Seq("id_a"))
      .select(col("id_a"),
        graft.functions.TextFunctions.tokenF1Micro(col("_ta"), col("_tb")).as("f1_scalar"))
    val joined = rel.join(sc, Seq("id_a"))
      .filter(col("f1_micro") =!= col("f1_scalar")).count()
    graft.CacheScope.release()
    assert(joined == 0L, "scalar and relational token-F1 disagree")
  }

  test("spanCorrupt: splicing targets back into corrupted reconstructs every doc") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").limit(200)
    val out = TextOps.spanCorrupt(docs, "doc_id", "text", maskPct = 15, spanLen = 3)
      .join(docs, Seq("doc_id"))
      .collect()
    assert(out.length == 200)
    var totalTokens = 0L
    var totalMasked = 0L
    val sentinel = "<X(\\d+)>".r
    out.foreach { r =>
      val (corr, tgt, nMasked, nSpans) = (r.getAs[String]("corrupted"),
        r.getAs[String]("targets"), r.getAs[Long]("n_masked"), r.getAs[Long]("n_spans"))
      val orig = r.getAs[String]("text").trim.split("\\s+").toSeq
      totalTokens += orig.length; totalMasked += nMasked
      assert(nSpans <= nMasked)
      // parse targets into span k -> tokens
      val spans = scala.collection.mutable.Map[Int, Vector[String]]()
      var cur = -1
      tgt.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Vector()
        case tok         => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.keySet == (0 until nSpans.toInt).toSet, "sentinels numbered densely")
      // splice spans back into the corrupted sequence
      val rebuilt = corr.split(" ").filter(_.nonEmpty).toSeq.flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok         => Seq(tok)
      }
      assert(rebuilt == orig, s"doc ${r.getLong(0)}: splice != original")
    }
    // ~15% of tokens masked corpus-wide (block-hash draw; loose bounds)
    val frac = totalMasked.toDouble / totalTokens
    assert(frac > 0.08 && frac < 0.25, s"masked fraction $frac far from 0.15")
    // content-addressed: identical under repartition
    val a = TextOps.spanCorrupt(docs, "doc_id", "text").select("doc_id", "corrupted")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextOps.spanCorrupt(docs.repartition(13), "doc_id", "text")
      .select("doc_id", "corrupted").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("calibrationCurve: equal-width bins, exact floor accuracy, degenerate range") {
    import spark.implicits._
    // scores 0..9 -> with nBins=2 and range [0,9]: den=10, bin = s*2 div 10
    val scored = (0L to 9L).map(i =>
      (i, if (i < 5) "x" else "y", i)).toDF("id", "pred", "s")
    // truth: ids 0-4 true 'x' except id 1; ids 5-9 true 'y' except 9
    val truth = (0L to 9L).map(i =>
      (i, if (i == 1) "z" else if (i == 9) "z" else if (i < 5) "x" else "y"))
      .toDF("id", "t")
    val out = TextOps.calibrationCurve(scored, "id", "pred", "s",
        truth, "id", "t", nBins = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bin 0 = scores 0-4 (4/5 correct -> 800000), bin 1 = 5-9 (4/5)
    assert(out == Map(0 -> ((5L, 4L, 800000L, 0L, 4L)),
      1 -> ((5L, 4L, 800000L, 5L, 9L))), s"got $out")
    // exact floor: 2 of 3 correct -> 666666 (not 666667)
    val three = TextOps.calibrationCurve(
      Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L)).toDF("id", "pred", "s"),
      "id", "pred", "s",
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "t"), "id", "t", nBins = 2)
    assert(three.filter(col("bin") === 0).head().getLong(3) == 666666L)
    // degenerate one-value score range -> everything in bin 0
    val degen = TextOps.calibrationCurve(
      Seq((1L, "a", 5L), (2L, "a", 5L)).toDF("id", "pred", "s"),
      "id", "pred", "s",
      Seq((1L, "a"), (2L, "b")).toDF("id", "t"), "id", "t", nBins = 10)
      .collect()
    assert(degen.length == 1 && degen.head.getInt(0) == 0 &&
      degen.head.getLong(3) == 500000L)
  }

  test("lengthBucketBatches: boundary assignment, dense batches, repartition-stable") {
    import spark.implicits._
    val rows = (1L to 35L).map(i => (i, 250L)) ++ // 35 rows in bucket 1
      Seq((100L, 199L), (101L, 200L), (102L, 799L), (103L, 800L), (104L, 5000L))
    val df = rows.toDF("id", "n_tok")
    val out = TextOps.lengthBucketBatches(df, "id", "n_tok",
      Seq(200L, 400L, 800L), batchSize = 16)
    val byId = out.collect().map(r =>
      r.getLong(0) -> ((r.getInt(2), r.getLong(3), r.getInt(4)))).toMap
    // upper-exclusive edges; past-last-edge rows overflow to bucket 3
    assert(byId(100L)._1 == 0 && byId(101L)._1 == 1 && byId(102L)._1 == 2 &&
      byId(103L)._1 == 3 && byId(104L)._1 == 3)
    // bucket 1 (35 + 1 rows): batches 0/1 full (16), batch 2 holds 4
    val b1 = out.filter(col("bucket") === 1)
      .groupBy("batch_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == Map(0L -> 16L, 1L -> 16L, 2L -> 4L), s"got $b1")
    // pos is dense 0..15 within a full batch
    val pos0 = out.filter(col("bucket") === 1 && col("batch_id") === 0)
      .select("pos").collect().map(_.getInt(0)).sorted.toSeq
    assert(pos0 == (0 to 15))
    // deterministic under repartitioning
    val again = TextOps.lengthBucketBatches(df.repartition(7), "id", "n_tok",
      Seq(200L, 400L, 800L), batchSize = 16)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3), r.getInt(4)))).toMap
    assert(again == byId)
    intercept[IllegalArgumentException] {
      TextOps.lengthBucketBatches(df, "id", "n_tok", Seq(400L, 200L), 16)
    }
    // NULL token counts must fail loudly, not slip into the overflow band
    val withNull = Seq((1L, java.lang.Long.valueOf(100L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "n_tok")
    val ex = intercept[Exception] {
      TextOps.lengthBucketBatches(withNull, "id", "n_tok", Seq(200L), 4).collect()
    }
    assert(ex.getMessage != null)
  }
}
