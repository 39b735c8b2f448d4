package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UAX #15 composition semantics of [[UnicodeNormalize]] and the unicode
  * mode of `TextOps.normalizeText` (the multilingual pre-dedup path —
  * gate q83 hash-checks the NFC mode against DuckDB `nfc_normalize`).
  * All non-ASCII is spelled in \u escapes so the decomposed fixtures can
  * never be silently re-composed by an editor/encoding pass. */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed: e + COMBINING ACUTE (U+0301); precomposed: U+00E9
  private val decomposed = "Cafe\u0301"
  private val precomposed = "Caf\u00e9"

  test("NFC composes combining sequences to precomposed forms; ASCII unchanged") {
    val got = Seq(decomposed, precomposed, "plain ascii 42", "Stra\u00dfe")
      .toDF("s")
      .select(UnicodeNormalize.nfc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(got(0) == precomposed, "decomposed must compose")
    assert(got(1) == precomposed, "already-NFC input unchanged")
    assert(got(2) == "plain ascii 42")
    assert(got(3) == "Stra\u00dfe", "NFC never touches sharp-s")
  }

  test("NFKC additionally folds compatibility forms (ligature, fullwidth)") {
    // U+FB01 LATIN SMALL LIGATURE FI -> "fi"; U+FF21 FULLWIDTH A -> "A"
    val got = Seq("\ufb01le \uff21BC", decomposed).toDF("s")
      .select(UnicodeNormalize.nfkc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(got(0) == "file ABC")
    assert(got(1) == precomposed, "NFKC includes canonical composition")
  }

  test("null propagates; expression agrees between codegen and interpreted eval") {
    val df = Seq(Some(decomposed), None).toDF("s")
      .select(UnicodeNormalize.nfc(col("s")).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(0) == precomposed && rows(1).isNullAt(0))
    // interpreted path (direct eval, no codegen): same result
    val expr = UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(decomposed),
      java.text.Normalizer.Form.NFC)
    assert(expr.eval(null).toString == precomposed)
  }

  test("normalizeText unicode mode: NFC + casefold + unicode-aware strip; ascii mode strips marks") {
    // "Cafe<acute>  NAI<diaeresis>VE <em dash> 42!"
    val docs = Seq((1L, decomposed + "  NAI\u0308VE \u2014 42!")).toDF("doc_id", "text")
    val uni = graft.operators.TextOps.normalizeText(docs, "text", unicode = true)
      .select("norm_text").as[String].head()
    assert(uni == "caf\u00e9 na\u00efve 42",
      s"got '$uni': accents must survive composed, punctuation must strip")
    val ascii = graft.operators.TextOps.normalizeText(docs, "text")
      .select("norm_text").as[String].head()
    assert(ascii == "cafe nai ve 42",
      s"got '$ascii': ascii mode strips the combining marks themselves")
  }
}
