package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the LLM-data-pipeline surface
  * (BASELINE.json north star; SURVEY.md §2C tail).
  *
  * Everything is built from codegen'd Spark built-ins over the `documents`
  * table and designed to be replicable in ANSI SQL (the DuckDB oracle), so
  * each op is both scalable (no UDF, stays in WholeStageCodegen) and
  * verifiable.
  */
object TextFunctions {

  /** Whitespace tokenizer — the canonical token stream for all text ops. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count via the whitespace tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word chunks of <=4 chars + digit runs +
    * punctuation, approximating byte-pair tokenizer granularity without a
    * vocab. Deterministic regex count, SQL-replicable. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** English-ish stopwords present in the synthetic corpus vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Number of stopword tokens. */
  def stopwordCount(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(Stopwords.map(_.asInstanceOf[Any]): _*)))
  }

  /** Characters outside [A-Za-z0-9 and whitespace] — punctuation-ish. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Heuristic document quality score in [0,1]:
    * 0.25·len_ok + 0.25·stopword-presence + 0.25·low-punct + 0.25·mean-token-len-ok.
    * Every term is an exact int/int ratio or comparison → deterministic. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val lenOk = when(nChar >= 100 && nChar <= 20000, 1.0).otherwise(0.0)
    val stopRatio = stopwordCount(text).cast("double") / nTok
    val stopOk = when(stopRatio > lit(0.01), 1.0).otherwise(0.0)
    val punctRatio = punctCount(text).cast("double") / nChar
    val punctOk = when(punctRatio < lit(0.1), 1.0).otherwise(0.0)
    val meanTokLen = nChar / nTok
    val tokLenOk = when(meanTokLen >= 2.0 && meanTokLen <= 12.0, 1.0).otherwise(0.0)
    (lenOk + stopOk + punctOk + tokLenOk) * 0.25
  }

  /** Language-ID by stopword evidence: returns the language whose marker
    * words appear most often, ties broken by language code order
    * (n-gram-heuristic family; markers chosen for the synthetic corpus).
    * Emits a struct(lang, hits). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    // array_max over struct(hits, negRank, lang) compares fields in order:
    // most marker hits wins; ties go to the alphabetically-first language
    // (negRank descends with list position).
    val ranked = LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      val hits = size(filter(toks, t => t.isin(markers.map(_.asInstanceOf[Any]): _*)))
      struct(hits.as("hits"), lit(-i).as("negRank"), lit(lang).as("lang"))
    }
    array_max(array(ranked: _*)).getField("lang")
  }

  /** Rolling polynomial fingerprint over the token stream:
    * h = fold(tokens, (acc, t) => (acc * 131 + md5_60(t) % 1000003) % 2147483647)
    * Small moduli keep every intermediate < 2^63 in any engine (DuckDB
    * errors on BIGINT overflow rather than wrapping, so wrapping arithmetic
    * is not portable). */
  def fingerprint(text: Column): Column = {
    val toks = tokens(text)
    aggregate(
      toks,
      lit(0L),
      (acc, t) =>
        (acc * 131 + conv(substring(md5(t), 1, 15), 16, 10).cast("long") % 1000003) % 2147483647L)
  }

  /** Per-row token-level F1 (micro-units) between two strings — the
    * SQuAD answer-scoring scalar (Rajpurkar et al. 2016), for tables
    * that carry prediction and gold in the SAME row (eval frames,
    * streaming scorers; the relational pair form is
    * [[graft.operators.TextOps.tokenF1Scores]]). Unigram multiset
    * overlap `m = Σ_t min(count_a(t), count_b(t))` over `a`'s DISTINCT
    * tokens, then `F1 = (2·10⁶·m) div (|a| + |b|)` — exact integer, 0
    * when both are empty.
    *
    * Stays a per-row projection (array higher-order functions — no
    * join, no shuffle, streams stateless); cost is
    * O(distinct_a · (|a| + |b|)) per row, the per-row analogue of a
    * gram-table join, fine at answer/sentence length. */
  def tokenF1Micro(a: Column, b: Column): Column = {
    val ta = tokens(a)
    val tb = tokens(b)
    val m = aggregate(
      array_distinct(ta),
      lit(0L),
      (acc, t) => acc + least(
        size(filter(ta, x => x === t)).cast("long"),
        size(filter(tb, x => x === t)).cast("long")))
    val num = m * 2000000L
    val den = (size(ta) + size(tb)).cast("long")
    when(den > 0, (num - pmod(num, den)) / den).otherwise(lit(0)).cast("long")
  }
}
