package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Web-corpus curation query pack — the published crawl-filter stages
  * (Gopher document rules, C4 line cleaning, CCNet perplexity buckets)
  * over `documents` (the LLM-pipeline north star; operators in
  * [[graft.operators.WebCuration]]).
  *
  * The synthetic corpus is single-line lowercase word salad, so the gates
  * run the q64 convention: both engines wrap every doc in the SAME
  * deterministic multi-line "web page" shell — headers, bullet lists,
  * symbol runs, digit runs, stopword/boilerplate lines keyed off
  * `doc_id` residues — so every rule sees both outcomes, then the
  * operator filters it back down. [[webAugment]] (Spark) and
  * [[webAugmentSql]] (DuckDB) are the two halves of that one fixture.
  */
object WebQueries {

  private val NL = "\n"

  /** The deterministic multi-line web-page shell around `text` —
    * byte-identical to [[webAugmentSql]]. */
  private[queries] def webAugment(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def ifMod(m: Int, s: String): Column =
      when(pmod(id, lit(m)) === 0, s).otherwise("")
    docs.select(id, concat(
      lit("Doc "), pmod(id, lit(7)), lit(" intro notes"),
      ifMod(5, " # # # # # # #"), lit(NL),
      ifMod(3, s"- item alpha one two$NL- item beta$NL"),
      ifMod(15, s"- more gamma$NL- more delta$NL- more epsilon$NL- more zeta$NL"),
      regexp_replace(col("text"), " batch", s".${NL}batch"),
      ifMod(8, s"${NL}wait for it...${NL}loading content..."),
      ifMod(9, s"${NL}12345 67890 13579 24680 97531 86420"),
      ifMod(2, s"${NL}of the and that have with extras here."),
      ifMod(6, NL + Seq.fill(25)("a").mkString(" ")),
      ifMod(13, s"${NL}enable javascript to view this site fully."),
      ifMod(17, s"${NL}lorem ipsum dolor sit amet filler text here."),
      ifMod(19, s"${NL}function f() { return 1 }"),
      when(pmod(id, lit(4)) === 0, s"${NL}read the full story more...")
        .otherwise(s"${NL}the end is here now.")
    ).as("text"))
  }

  /** [[webAugment]] as a DuckDB scalar expression over `documents`. */
  private[queries] val webAugmentSql: String = {
    def ifMod(m: Int, s: String): String =
      s"CASE WHEN doc_id % $m = 0 THEN '$s' ELSE '' END"
    "'Doc ' || (doc_id % 7) || ' intro notes' || " +
      ifMod(5, " # # # # # # #") + " || chr(10) || " +
      s"CASE WHEN doc_id % 3 = 0 THEN '- item alpha one two' || chr(10) || " +
      s"'- item beta' || chr(10) ELSE '' END || " +
      "CASE WHEN doc_id % 15 = 0 THEN '- more gamma' || chr(10) || " +
      "'- more delta' || chr(10) || '- more epsilon' || chr(10) || " +
      "'- more zeta' || chr(10) ELSE '' END || " +
      "regexp_replace(text, ' batch', '.' || chr(10) || 'batch', 'g') || " +
      "CASE WHEN doc_id % 8 = 0 THEN chr(10) || 'wait for it...' || chr(10) || " +
      "'loading content...' ELSE '' END || " +
      "CASE WHEN doc_id % 9 = 0 THEN chr(10) || " +
      "'12345 67890 13579 24680 97531 86420' ELSE '' END || " +
      "CASE WHEN doc_id % 2 = 0 THEN chr(10) || " +
      "'of the and that have with extras here.' ELSE '' END || " +
      "CASE WHEN doc_id % 6 = 0 THEN chr(10) || '" +
      Seq.fill(25)("a").mkString(" ") + "' ELSE '' END || " +
      "CASE WHEN doc_id % 13 = 0 THEN chr(10) || " +
      "'enable javascript to view this site fully.' ELSE '' END || " +
      "CASE WHEN doc_id % 17 = 0 THEN chr(10) || " +
      "'lorem ipsum dolor sit amet filler text here.' ELSE '' END || " +
      "CASE WHEN doc_id % 19 = 0 THEN chr(10) || " +
      "'function f() { return 1 }' ELSE '' END || " +
      "CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'read the full story more...' " +
      "ELSE chr(10) || 'the end is here now.' END"
  }

  // Gopher document-quality rules (Rae et al. 2021 A1.1) over the web
  // shell; thresholds tightened from the paper's crawl-scale defaults to
  // the fixture's scale (minWords 40, bullet 40%) so every flag exercises
  // BOTH outcomes at gate SF — the rule ARITHMETIC is what's under test.
  def q172GopherRules(s: SparkSession, d: String): DataFrame =
    graft.operators.WebCuration.gopherRules(
      webAugment(Tables.documents(s, d)), "doc_id", "text",
      minWords = 40, maxBulletPct = 40)

  // C4 line-level cleaning (Raffel et al. 2020 §2.2) over the web shell.
  def q173C4Clean(s: SparkSession, d: String): DataFrame =
    graft.operators.WebCuration.c4Clean(
      webAugment(Tables.documents(s, d)), "doc_id", "text")

  // CCNet perplexity terciles per language over the RAW corpus (LM
  // scores vary naturally; no augmentation needed).
  def q174PerplexityBuckets(s: SparkSession, d: String): DataFrame =
    graft.operators.WebCuration.perplexityBuckets(
      Tables.documents(s, d), "doc_id", "text", "lang")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_gopher_rules" -> q172GopherRules,
    "q173_c4_clean" -> q173C4Clean,
    "q174_perplexity_buckets" -> q174PerplexityBuckets)

  private val gopherStopSql =
    graft.operators.WebCuration.GopherStopwords.map(s => s"'$s'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "q172_gopher_rules" ->
      s"""WITH aug AS (SELECT doc_id, $webAugmentSql AS text FROM documents),
          f AS (
            SELECT doc_id,
              list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks,
              list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                l -> l <> '') AS lines,
              len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
            FROM aug
          ), c AS (
            SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_words,
              CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT)
                AS word_chars,
              CAST(n_symbols AS BIGINT) AS n_symbols,
              CAST(len(lines) AS BIGINT) AS n_lines,
              CAST(len(list_filter(lines,
                l -> substr(l, 1, 2) IN ('- ', '* ', '• '))) AS BIGINT)
                AS n_bullet_lines,
              CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT)
                AS n_ellipsis_lines,
              CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
                AS n_alpha_words,
              CAST(len(list_filter(toks, t -> t IN ($gopherStopSql))) AS BIGINT)
                AS n_stop
            FROM f
          )
          SELECT doc_id, n_words, word_chars, n_symbols, n_lines,
            n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop,
            CAST(n_words >= 40 AND n_words <= 100000 AS INT) AS f_word_count,
            CAST(word_chars >= 3 * n_words AND word_chars <= 10 * n_words
              AND n_words > 0 AS INT) AS f_mean_len,
            CAST(n_symbols * 100 <= 10 * n_words AS INT) AS f_symbol,
            CAST(n_bullet_lines * 100 <= 40 * n_lines AS INT) AS f_bullet,
            CAST(n_ellipsis_lines * 100 <= 30 * n_lines AS INT) AS f_ellipsis,
            CAST(n_alpha_words * 100 >= 80 * n_words AS INT) AS f_alpha,
            CAST(n_stop >= 2 AS INT) AS f_stop,
            CAST(n_words >= 40 AND n_words <= 100000
              AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
              AND n_words > 0
              AND n_symbols * 100 <= 10 * n_words
              AND n_bullet_lines * 100 <= 40 * n_lines
              AND n_ellipsis_lines * 100 <= 30 * n_lines
              AND n_alpha_words * 100 >= 80 * n_words
              AND n_stop >= 2 AS INT) AS pass
          FROM c""",
    "q173_c4_clean" ->
      s"""WITH aug AS (SELECT doc_id, $webAugmentSql AS text FROM documents),
          f AS (
            SELECT doc_id, text,
              list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                l -> l <> '') AS lines
            FROM aug
          ), k AS (
            SELECT doc_id, lines,
              list_filter(lines, l -> regexp_matches(l, '[.!?"]$$')
                AND len(string_split_regex(l, '\\s+')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept,
              (NOT contains(lower(text), 'lorem ipsum')
                AND NOT contains(text, '{')) AS doc_ok
            FROM f
          )
          SELECT doc_id,
            CASE WHEN doc_ok AND len(kept) >= 3
              THEN array_to_string(kept, chr(10)) ELSE '' END AS clean_text,
            CAST(len(lines) AS BIGINT) AS n_lines,
            CAST(len(kept) AS BIGINT) AS n_kept,
            CAST(doc_ok AND len(kept) >= 3 AS INT) AS doc_kept
          FROM k""",
    "q174_perplexity_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         ev AS (
           SELECT doc_id, CAST(k.k AS BIGINT) AS p, toks[k.k + 1] AS cur,
             CASE WHEN k.k > 0 THEN toks[k.k] END AS prev
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k < len(toks)),
         uni AS (SELECT cur AS w, CAST(count(*) AS BIGINT) AS cu FROM ev GROUP BY cur),
         st AS (SELECT CAST(sum(cu) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
         bi AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
                FROM ev WHERE p > 0 GROUP BY prev, cur),
         sc AS (
           SELECT ev.doc_id,
             CAST(round(1000000.0 * -ln((CAST(u.cu AS DOUBLE) + 0.1) /
               (CAST(st.n AS DOUBLE) + 0.1 * CAST(st.v AS DOUBLE)))) AS BIGINT) AS nll
           FROM ev JOIN uni u ON ev.cur = u.w CROSS JOIN st WHERE ev.p = 0
           UNION ALL
           SELECT ev.doc_id,
             CAST(round(1000000.0 * -ln((CAST(bi.cb AS DOUBLE) + 0.1) /
               (CAST(u.cu AS DOUBLE) + 0.1 * CAST(st.v AS DOUBLE)))) AS BIGINT) AS nll
           FROM ev JOIN bi ON ev.prev = bi.prev AND ev.cur = bi.cur
             JOIN uni u ON ev.prev = u.w CROSS JOIN st WHERE ev.p > 0),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(nll) AS BIGINT) AS nll_micro
                 FROM sc GROUP BY doc_id),
         perdoc AS (
           SELECT a.doc_id, d.lang, a.n_tokens, a.nll_micro,
             CAST(a.nll_micro // a.n_tokens AS BIGINT) AS ppt_micro
           FROM agg a JOIN documents d USING (doc_id)),
         hist AS (
           SELECT lang, ppt_micro, CAST(count(*) AS BIGINT) AS c
           FROM perdoc GROUP BY lang, ppt_micro),
         cum AS (
           SELECT lang, ppt_micro,
             sum(c) OVER (PARTITION BY lang ORDER BY ppt_micro) AS cum,
             sum(c) OVER (PARTITION BY lang) AS tot
           FROM hist),
         cuts AS (
           SELECT lang,
             min(CASE WHEN cum * 3 >= tot THEN ppt_micro END) AS c1,
             min(CASE WHEN cum * 3 >= tot * 2 THEN ppt_micro END) AS c2
           FROM cum GROUP BY lang)
         SELECT p.doc_id, p.lang, p.n_tokens, p.nll_micro, p.ppt_micro,
           CASE WHEN p.ppt_micro <= c.c1 THEN 'head'
                WHEN p.ppt_micro <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM perdoc p JOIN cuts c USING (lang)""")
}
