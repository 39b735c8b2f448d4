package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus curation filters — the published document/line-grade
  * filter stages every large crawl-derived training corpus runs before
  * dedup and mixing (reference capability surface: the LLM-pipeline
  * north star; the rule sets themselves are from public papers):
  *
  *   - [[gopherRules]] — the document-level quality heuristics of
  *     Rae et al. 2021 ("Scaling Language Models: … Gopher", appendix
  *     A1.1, the MassiveText filter), as exact integer arithmetic.
  *   - [[c4Clean]] — the line-level cleaning of Raffel et al. 2020
  *     ("Exploring the Limits of Transfer Learning …", the C4 corpus,
  *     §2.2): keep lines that look like prose, drop pages with
  *     boilerplate/code markers.
  *   - [[perplexityBuckets]] — the CCNet bucketing of Wenzek et al.
  *     2020 ("CCNet: Extracting High Quality Monolingual Datasets …"):
  *     per-language head/middle/tail terciles by language-model
  *     perplexity, via VALUE cutoffs (never a corpus-wide rank).
  *
  * Every rule is computed with integer cross-multiplication (never a
  * float ratio), so a pass/fail flag replays bit-for-bit in any engine —
  * the [[graft.functions.Portable]] convention — and every stage is a
  * stateless per-row projection over codegen'd built-ins (no UDF, no
  * shuffle), so the filters run at scan speed on the 100-TB corpus and
  * stream unchanged (a filter that shuffles is a broken filter).
  */
object WebCuration {

  /** The Gopher stopword list (Rae et al. 2021, A1.1): a quality doc
    * contains at least two of these. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Document-level Gopher quality rules. Emits per-document counters
    * and one 0/1 flag per rule plus the conjunction:
    *
    *   - `f_word_count`: `minWords <= n_words <= maxWords`
    *   - `f_mean_len`: mean word length in `[minMeanLen, maxMeanLen]`
    *     chars — as `minMeanLen*n_words <= word_chars <= maxMeanLen*n_words`
    *   - `f_symbol`: (`#` or `...`) count <= `maxSymbolPct`% of words
    *   - `f_bullet`: <= `maxBulletPct`% of lines start with a bullet
    *   - `f_ellipsis`: <= `maxEllipsisPct`% of lines end with `...`
    *   - `f_alpha`: >= `minAlphaPct`% of words contain a letter
    *   - `f_stop`: >= `minStopwords` Gopher stopword tokens
    *
    * All thresholds are integer percents and every comparison is an
    * integer cross-multiplication, so the flags are engine-exact. An
    * empty/whitespace-only document has no words and no lines: the
    * >=-flags fail, the <=-ratio flags pass vacuously (0 of 0 lines),
    * matching the paper's "fraction of lines" reading.
    *
    * Shape: one per-row projection — the token and line arrays
    * materialize as columns FIRST and every lambda closes over those
    * attributes only (the explodedNgrams lesson: a lambda over an
    * unprojected expression re-evaluates it per element). No shuffle,
    * no state; runs on batch frames and streams verbatim. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Int = 3, maxMeanLen: Int = 10,
      maxSymbolPct: Int = 10, maxBulletPct: Int = 90,
      maxEllipsisPct: Int = 30, minAlphaPct: Int = 80,
      minStopwords: Int = 2): DataFrame = {
    require(minWords >= 0 && maxWords >= minWords, "0 <= minWords <= maxWords")
    require(minMeanLen >= 0 && maxMeanLen >= minMeanLen, "0 <= minMeanLen <= maxMeanLen")
    require(Seq(maxSymbolPct, maxBulletPct, maxEllipsisPct, minAlphaPct)
      .forall(p => p >= 0 && p <= 100), "percent thresholds in [0, 100]")
    val base = docs.select(col(idCol), col(textCol),
      split(trim(col(textCol)), "\\s+").as("_toks"),
      split(col(textCol), "\n").as("_lines"))
    val counted = base.select(col(idCol),
      // a trim'd empty string still splits into [""] — count real words
      size(filter(col("_toks"), t => t =!= "")).cast("long").as("n_words"),
      aggregate(filter(col("_toks"), t => t =!= ""), lit(0L),
        (acc, t) => acc + length(t)).as("word_chars"),
      size(regexp_extract_all(col(textCol), lit("#|\\.\\.\\."), lit(0)))
        .cast("long").as("n_symbols"),
      size(filter(col("_lines"), l => trim(l) =!= "")).cast("long").as("n_lines"),
      size(filter(col("_lines"),
        l => trim(l).substr(lit(1), lit(2)).isin("- ", "* ", "• ")))
        .cast("long").as("n_bullet_lines"),
      size(filter(col("_lines"), l => endswith(trim(l), lit("..."))))
        .cast("long").as("n_ellipsis_lines"),
      size(filter(col("_toks"), t => t.rlike("[A-Za-z]")))
        .cast("long").as("n_alpha_words"),
      size(filter(col("_toks"),
        t => t.isin(GopherStopwords.map(_.asInstanceOf[Any]): _*)))
        .cast("long").as("n_stop"))
    val flags = counted.select(col(idCol), col("n_words"), col("word_chars"),
      col("n_symbols"), col("n_lines"), col("n_bullet_lines"),
      col("n_ellipsis_lines"), col("n_alpha_words"), col("n_stop"),
      (col("n_words") >= minWords && col("n_words") <= maxWords)
        .cast("int").as("f_word_count"),
      (col("word_chars") >= lit(minMeanLen.toLong) * col("n_words") &&
        col("word_chars") <= lit(maxMeanLen.toLong) * col("n_words") &&
        col("n_words") > 0).cast("int").as("f_mean_len"),
      (col("n_symbols") * 100L <= lit(maxSymbolPct.toLong) * col("n_words"))
        .cast("int").as("f_symbol"),
      (col("n_bullet_lines") * 100L <= lit(maxBulletPct.toLong) * col("n_lines"))
        .cast("int").as("f_bullet"),
      (col("n_ellipsis_lines") * 100L <= lit(maxEllipsisPct.toLong) * col("n_lines"))
        .cast("int").as("f_ellipsis"),
      (col("n_alpha_words") * 100L >= lit(minAlphaPct.toLong) * col("n_words"))
        .cast("int").as("f_alpha"),
      (col("n_stop") >= minStopwords).cast("int").as("f_stop"))
    flags.withColumn("pass",
      (col("f_word_count") === 1 && col("f_mean_len") === 1 &&
        col("f_symbol") === 1 && col("f_bullet") === 1 &&
        col("f_ellipsis") === 1 && col("f_alpha") === 1 &&
        col("f_stop") === 1).cast("int"))
  }

  /** C4 line-level cleaning (Raffel et al. 2020 §2.2). A LINE is kept
    * iff it ends with a terminal punctuation mark (`.`/`!`/`?`/`"`),
    * has at least `minLineWords` words, and does not mention
    * `javascript` (case-insensitive). A DOCUMENT is kept iff it does
    * not contain `lorem ipsum` (case-insensitive) or a curly brace
    * anywhere, and at least `minKeptLines` lines survive. Output per
    * input document: `clean_text` (kept lines re-joined with `\n`; empty
    * when the doc is dropped), `n_lines`, `n_kept`, `doc_kept` — the
    * stats row a curation report needs even for dropped docs — plus any
    * `keepCols` passed through unchanged (e.g. the ORIGINAL text, so a
    * downstream scorer can compare before/after in the same row).
    *
    * Shape: line array materialized once, per-line predicates as array
    * lambdas over that attribute, re-join via `array_join` — a pure
    * per-row projection (no explode/regroup round-trip: the line grain
    * never leaves the row), no shuffle, stream-safe. */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 3,
      keepCols: Seq[String] = Nil): DataFrame = {
    require(minLineWords >= 1, "minLineWords >= 1")
    require(minKeptLines >= 0, "minKeptLines >= 0")
    // keepCols ride through unchanged (idCol/textCol dedup'd — textCol is
    // carried anyway and re-emitted only when asked for)
    val extra = keepCols.filterNot(Set(idCol, textCol)).map(col)
    val base = docs.select(col(idCol) +: col(textCol) +:
      filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => l =!= "").as("_lines") +: extra: _*)
    def lineKeep(l: org.apache.spark.sql.Column) =
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = base.select(col(idCol) +: col(textCol) +:
      col("_lines") +:
      filter(col("_lines"), lineKeep _).as("_kept") +:
      (!lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{")).as("_doc_ok") +: extra: _*)
    val passthrough = keepCols.filterNot(_ == idCol).map(col)
    kept.select(col(idCol) +:
      when(col("_doc_ok") && size(col("_kept")) >= minKeptLines,
        array_join(col("_kept"), "\n")).otherwise(lit("")).as("clean_text") +:
      size(col("_lines")).cast("long").as("n_lines") +:
      size(col("_kept")).cast("long").as("n_kept") +:
      (col("_doc_ok") && size(col("_kept")) >= minKeptLines)
        .cast("int").as("doc_kept") +: passthrough: _*)
  }

  /** CCNet perplexity bucketing (Wenzek et al. 2020): per `byCol`
    * (language), docs fall into `head` / `middle` / `tail` terciles by
    * language-model score — here the add-α bigram NLL of
    * [[TextOps.ngramLmScore]], reduced to an exact per-token milli-NLL
    * (`nll_milli_per_token = floor(nll_micro * 1000 / (n_tokens * 1e6))`
    * — equivalently floor-div of `nll_micro·1000 / n_tokens` scaled; we
    * keep micro precision: `floor(nll_micro / n_tokens)` in micro-NLL
    * per token) with the decimal(38,0) floor-division idiom.
    *
    * Bucketing is by VALUE CUTOFF, not rank: the head cutoff is the
    * smallest per-token score `v` such that at least a third of the
    * language's docs score `<= v` (likewise two-thirds for middle).
    * Ties share a bucket — deterministic, SQL-replayable, and the
    * 100-TB shape: the only window runs over the per-(language, score)
    * HISTOGRAM (cardinality = distinct integer scores per language,
    * bounded), never a per-language rank over the corpus; cutoffs are a
    * languages-sized frame that broadcasts back. CCNet itself uses
    * value cutoffs from a histogram for exactly this reason.
    *
    * Output: `idCol`, `byCol`, `n_tokens`, `nll_micro`, `ppt_micro`
    * (per-token micro-NLL), `bucket`. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      byCol: String, alpha: Double = 0.1): DataFrame = {
    val scored = TextOps.ngramLmScore(docs, idCol, textCol, alpha = alpha)
      .join(docs.select(col(idCol), col(byCol)), Seq(idCol))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ppt = {
      val num = dec(col("nll_micro"))
      val den = dec(col("n_tokens"))
      ((num - pmod(num, den)) / den).cast("long")
    }
    // perDoc feeds BOTH the histogram branch and the final bucket join,
    // so the INPUT frame evaluates twice (the LM event table is already
    // cached inside ngramLmScore). Deliberately NOT cached here: over a
    // raw scan the double evaluation is cheaper than materializing the
    // cache (measured 1.2 vs 2.2 s on the standalone gate); a caller
    // whose input is an expensive derived chain caches THAT frame
    // instead (the q177 composition does — caller-side caching puts the
    // decision where the cost lives).
    val perDoc = scored.select(col(idCol), col(byCol), col("n_tokens"),
      col("nll_micro"), ppt.as("ppt_micro"))
    // histogram → cumulative counts → per-language cutoffs. The window
    // orders DISTINCT scores within a language (bounded by score
    // cardinality); the doc-grain frame never sorts globally.
    val hist = perDoc.groupBy(col(byCol), col("ppt_micro"))
      .agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol)).orderBy(col("ppt_micro"))
    val cum = hist.select(col(byCol), col("ppt_micro"),
      sum(col("_c")).over(w).as("_cum"),
      sum(col("_c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(byCol))).as("_tot"))
    val cuts = cum.groupBy(col(byCol)).agg(
      min(when(col("_cum") * 3 >= col("_tot"), col("ppt_micro"))).as("_c1"),
      min(when(col("_cum") * 3 >= col("_tot") * 2, col("ppt_micro"))).as("_c2"))
    perDoc.join(broadcast(cuts), Seq(byCol))
      .select(col(idCol), col(byCol), col("n_tokens"), col("nll_micro"),
        col("ppt_micro"),
        when(col("ppt_micro") <= col("_c1"), "head")
          .when(col("ppt_micro") <= col("_c2"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
