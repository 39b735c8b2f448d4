package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  private def gopherRow(text: String) =
    WebCuration.gopherRules(Seq((1L, text)).toDF("id", "text"), "id", "text",
        minWords = 3, maxWords = 10, minMeanLen = 2, maxMeanLen = 6,
        maxSymbolPct = 20, maxBulletPct = 50, maxEllipsisPct = 50,
        minAlphaPct = 60, minStopwords = 1)
      .collect().head

  test("gopherRules: counters and every flag, hand-computed") {
    // 3 lines; 1 bullet; 1 ellipsis-terminated; the stopword 'the'
    val r = gopherRow("the cat sat\n- bullet line\nwait now...")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_words") == 8L, m) // the cat sat - bullet line wait now...
    assert(m("word_chars") == ("thecatsat".length + "-bulletline".length +
      "waitnow...".length).toLong, m)
    assert(m("n_lines") == 3L && m("n_bullet_lines") == 1L &&
      m("n_ellipsis_lines") == 1L, m)
    assert(m("n_symbols") == 1L, m) // the '...' run
    assert(m("n_stop") == 1L && m("f_stop") == 1, m)
    assert(m("f_word_count") == 1, m) // 8 in [3, 10]
    assert(m("f_bullet") == 1, m)     // 1 of 3 lines = 33% <= 50%
    assert(m("f_ellipsis") == 1, m)   // 33% <= 50%
  }

  test("gopherRules: bullet/ellipsis percentages are line-fraction exact") {
    val r = gopherRow("- a b\n- c d\nplain line here")
    // 2 of 3 lines bulleted = 66% > 50% -> fail; 0 ellipsis -> pass
    assert(r.getAs[Int]("f_bullet") == 0)
    assert(r.getAs[Int]("f_ellipsis") == 1)
  }

  test("gopherRules: symbol/alpha/mean-length cross-multiplications") {
    // 6 words, 2 '#' symbols: 200 > 20*6 -> f_symbol 0; only ab/cd have
    // letters: 2 of 6 = 33% < 60% -> f_alpha 0; 8 chars over 6 words is
    // below the 2-char mean floor -> f_mean_len 0
    val r = gopherRow("ab # cd 7 9 #")
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_symbols") == 2L)
    assert(r.getAs[Int]("f_symbol") == 0)
    assert(r.getAs[Long]("n_alpha_words") == 2L)
    assert(r.getAs[Int]("f_alpha") == 0)
    assert(r.getAs[Long]("word_chars") == 8L)
    assert(r.getAs[Int]("f_mean_len") == 0)
  }

  test("gopherRules: empty document — >=-rules fail, line-fraction rules pass vacuously") {
    val r = gopherRow("   ")
    assert(r.getAs[Long]("n_words") == 0L && r.getAs[Long]("n_lines") == 0L)
    assert(r.getAs[Int]("f_word_count") == 0)
    assert(r.getAs[Int]("f_mean_len") == 0)
    assert(r.getAs[Int]("f_bullet") == 1 && r.getAs[Int]("f_ellipsis") == 1)
    assert(r.getAs[Int]("f_stop") == 0)
    assert(r.getAs[Int]("pass") == 0)
  }

  private def c4Row(text: String, minKept: Int = 1) =
    WebCuration.c4Clean(Seq((1L, text)).toDF("id", "text"), "id", "text",
      minLineWords = 3, minKeptLines = minKept).collect().head

  test("c4Clean: line rules — terminal punctuation, min words, javascript") {
    val r = c4Row("this line is kept.\nshort one.\nno terminal punct here\n" +
      "please enable JavaScript to proceed.\nanother good line stays!")
    assert(r.getAs[Long]("n_lines") == 5L)
    assert(r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[String]("clean_text") ==
      "this line is kept.\nanother good line stays!")
    assert(r.getAs[Int]("doc_kept") == 1)
  }

  test("c4Clean: document rules — lorem ipsum / brace drop, min kept lines") {
    assert(c4Row("good line stays here.\nsome Lorem Ipsum filler.")
      .getAs[Int]("doc_kept") == 0)
    assert(c4Row("good line stays here.\nvar f = function() { x }.")
      .getAs[Int]("doc_kept") == 0)
    val few = c4Row("only one keepable line.", minKept = 2)
    assert(few.getAs[Int]("doc_kept") == 0 && few.getAs[String]("clean_text") == "")
    // dropped docs still report their line stats
    assert(few.getAs[Long]("n_kept") == 1L)
  }

  test("c4Clean: quote terminator counts as terminal punctuation") {
    val r = c4Row("he said \"hello there friend.\"")
    assert(r.getAs[Long]("n_kept") == 1L)
  }

  test("perplexityBuckets: value-cutoff terciles — ties share a bucket, per-language") {
    // lang A: 6 docs with scores making clean thirds; lang B: all ties
    val docs = Seq(
      (1L, "x x x x", "A"), (2L, "x x x x", "A"),          // low nll (frequent)
      (3L, "x y x y", "A"), (4L, "y x y x", "A"),          // mid
      (5L, "q r s t", "A"), (6L, "u v w z", "A"),          // high (rare tokens)
      (7L, "m m m m", "B"), (8L, "m m m m", "B"), (9L, "m m m m", "B")
    ).toDF("id", "text", "lang")
    val out = WebCuration.perplexityBuckets(docs, "id", "text", "lang")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    graft.CacheScope.release()
    assert(out(1L) == "head" && out(2L) == "head", out)
    assert(out(5L) == "tail" && out(6L) == "tail", out)
    // identical scores all land in ONE bucket (value cutoff, not rank):
    // the first cutoff covers >= 1/3 of B, and every B doc shares it
    assert(Set(out(7L), out(8L), out(9L)) == Set("head"), out)
  }

  test("perplexityBuckets: per-token normalization — doc length does not decide the bucket") {
    // docs 1 and 2 repeat the same frequent bigram at different lengths:
    // both score far below the rare-token doc 3 per token, so neither
    // lands in the tail regardless of raw (length-proportional) NLL
    val docs = Seq(
      (1L, "x y x y x y x y", "A"),
      (2L, "x y x y", "A"),
      (3L, "q r s t u v", "A")
    ).toDF("id", "text", "lang")
    val out = WebCuration.perplexityBuckets(docs, "id", "text", "lang")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("bucket"), r.getAs[Long]("ppt_micro")))).toMap
    graft.CacheScope.release()
    assert(out(3L)._1 == "tail", out)
    assert(out(1L)._1 != "tail" && out(2L)._1 != "tail", out)
  }
}
