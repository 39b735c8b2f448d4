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
  private[graft] def webAugment(docs: DataFrame): DataFrame = {
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

  /** The chat-turn fixture: q122's sentence stream with a deterministic
    * role/content assignment that plants every violation class —
    * off-whitelist role (%23), duplicate consecutive role (%10=3),
    * assistant-first opening (odd non-special ids), empty content
    * (%29) — byte-identical to the SQL half in the q175 oracle. */
  private[queries] def chatTurns(s: SparkSession, d: String): DataFrame = {
    val sents = graft.operators.TextOps.splitSentences(
      TextQueries.sentenceAugment(Tables.documents(s, d)), "doc_id", "text")
    val id = col("doc_id")
    val idx = col("sent_idx")
    val role = when(pmod(id, lit(23)) === 0 && idx === 1, "tool")
      .when(pmod(id, lit(5)) === 0 && idx === 0, "system")
      .when(pmod(id, lit(10)) === 3 && idx <= 1, "user")
      .when(pmod(id, lit(2)) === 0,
        when(pmod(idx, lit(2)) === 0, "user").otherwise("assistant"))
      .otherwise(when(pmod(idx, lit(2)) === 0, "assistant").otherwise("user"))
    val content = when(pmod(id, lit(29)) === 0 && idx === 1, "")
      .otherwise(col("sentence"))
    sents.select(id, idx, role.as("role"), content.as("content"))
  }

  // SFT chat rendering + structural validation over the turn fixture.
  def q175ChatRender(s: SparkSession, d: String): DataFrame =
    graft.operators.Chat.renderConversations(
      chatTurns(s, d), "doc_id", "sent_idx", "role", "content")

  // Curation v7 — the crawl-filter composition, every stage an engine
  // operator in ONE plan: (1) the web shell cleans line-level through
  // c4Clean (dropped docs exit); (2) survivors' clean_text passes the
  // Gopher document rules (minWords relaxed to the post-cleaning scale);
  // (3) the CCNet perplexity terciles run per language over the
  // FILTERED corpus (the model trains on survivors — the honest CCNet
  // order) and the tail bucket is dropped. The published crawl pipeline
  // end-to-end, hash-checked row for row.
  def q177CurationV7(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cleaned = graft.operators.WebCuration.c4Clean(
        webAugment(docs), "doc_id", "text")
      .filter(col("doc_kept") === 1)
      .select(col("doc_id"), col("clean_text").as("text"))
    val passed = graft.operators.WebCuration.gopherRules(
        cleaned, "doc_id", "text", minWords = 10)
      .filter(col("pass") === 1).select("doc_id")
    // the filter chain is every downstream consumer's upstream (LM event
    // build + the byCol join + both perDoc branches re-evaluate their
    // input): cache the survivor frame ONCE at the caller — the operator
    // itself stays cache-free so the standalone gate (q174, raw scan
    // input) never pays materialization it doesn't need
    val survivors = graft.CacheScope.track(
      cleaned.join(passed, Seq("doc_id"))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
    graft.operators.WebCuration.perplexityBuckets(
        survivors, "doc_id", "text", "lang")
      .filter(col("bucket") =!= "tail")
  }

  // DPO preference pairs: prompts = docs, candidates = the q122 sentence
  // stream, score = sentence length (deterministic, tie-rich — the
  // tie-break law is live at gate SF).
  def q178PreferencePairs(s: SparkSession, d: String): DataFrame = {
    val sents = graft.operators.TextOps.splitSentences(
      TextQueries.sentenceAugment(Tables.documents(s, d)), "doc_id", "text")
    graft.operators.Chat.preferencePairs(
      sents.select(col("doc_id"), col("sent_idx"),
        length(col("sentence")).as("score")),
      "doc_id", "sent_idx", "score", minMargin = 1L)
  }

  // SFT loss-mask spans over the q175 conversations: the assistant-
  // content character intervals of the rendered training string.
  def q179LossMask(s: SparkSession, d: String): DataFrame =
    graft.operators.Chat.lossMaskSpans(
      chatTurns(s, d), "doc_id", "sent_idx", "role", "content")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_gopher_rules" -> q172GopherRules,
    "q173_c4_clean" -> q173C4Clean,
    "q174_perplexity_buckets" -> q174PerplexityBuckets,
    "q175_chat_render" -> q175ChatRender,
    "q177_curation_v7" -> q177CurationV7,
    "q178_preference_pairs" -> q178PreferencePairs,
    "q179_loss_mask" -> q179LossMask)

  private val gopherStopSql =
    graft.operators.WebCuration.GopherStopwords.map(s => s"'$s'").mkString(", ")

  /** The Gopher counter CTEs over a rel exposing (doc_id, text) — ONE
    * fragment shared by the standalone gate (q172), the streaming twin
    * (q176, same oracle) and the composition (q177): the counter
    * arithmetic cannot drift between gates (the bm25CtesSql sharing
    * discipline). Exposes `c` with the nine counters. */
  private def gopherCountersSql(src: String): String =
    s"""gf AS (
            SELECT doc_id,
              list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks,
              list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                l -> l <> '') AS lines,
              len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
            FROM $src
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
            FROM gf
          )"""

  /** The Gopher pass-predicate over `c`'s counters, parameterized the
    * same way the operator is. */
  private def gopherPassSql(minWords: Int, maxBulletPct: Int): String =
    s"""n_words >= $minWords AND n_words <= 100000
              AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
              AND n_words > 0
              AND n_symbols * 100 <= 10 * n_words
              AND n_bullet_lines * 100 <= $maxBulletPct * n_lines
              AND n_ellipsis_lines * 100 <= 30 * n_lines
              AND n_alpha_words * 100 >= 80 * n_words
              AND n_stop >= 2"""

  /** The C4 keep CTEs over a rel exposing (doc_id, text): exposes `k`
    * with (doc_id, lines, kept, doc_ok) — shared by q173 and q177. */
  private[queries] def c4CtesSql(src: String): String =
    s"""cf AS (
            SELECT doc_id, text,
              list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                l -> l <> '') AS lines
            FROM $src
          ), k AS (
            SELECT doc_id, lines,
              list_filter(lines, l -> regexp_matches(l, '[.!?"]$$')
                AND len(string_split_regex(l, '\\s+')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept,
              (NOT contains(lower(text), 'lorem ipsum')
                AND NOT contains(text, '{')) AS doc_ok
            FROM cf
          )"""

  /** The q175 chat-turn fixture as DuckDB CTEs (aug → sentence split →
    * role/content assignment) — ONE fragment shared by the render gate
    * (q175) and the loss-mask gate (q179): the fixture cannot drift
    * between gates. Exposes `turns` (doc_id, sent_idx, role, content). */
  private def chatTurnsCtesSql: String =
    s"""aug AS (
           ${TextQueries.sentAugSql("documents", "text")}
         ), ${TextQueries.sentSplitCtesSql("aug")}, turns AS (
           SELECT doc_id, sent_idx,
             CASE
               WHEN doc_id % 23 = 0 AND sent_idx = 1 THEN 'tool'
               WHEN doc_id % 5 = 0 AND sent_idx = 0 THEN 'system'
               WHEN doc_id % 10 = 3 AND sent_idx <= 1 THEN 'user'
               WHEN doc_id % 2 = 0 THEN
                 CASE WHEN sent_idx % 2 = 0 THEN 'user' ELSE 'assistant' END
               ELSE CASE WHEN sent_idx % 2 = 0 THEN 'assistant' ELSE 'user' END
             END AS role,
             CASE WHEN doc_id % 29 = 0 AND sent_idx = 1 THEN ''
               ELSE sentence END AS content
           FROM x
         )"""

  val oracles: Map[String, String] = Map(
    "q172_gopher_rules" ->
      s"""WITH aug AS (SELECT doc_id, $webAugmentSql AS text FROM documents),
          ${gopherCountersSql("aug")}
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
            CAST(${gopherPassSql(40, 40)} AS INT) AS pass
          FROM c""",
    "q173_c4_clean" ->
      s"""WITH aug AS (SELECT doc_id, $webAugmentSql AS text FROM documents),
          ${c4CtesSql("aug")}
          SELECT doc_id,
            CASE WHEN doc_ok AND len(kept) >= 3
              THEN array_to_string(kept, chr(10)) ELSE '' END AS clean_text,
            CAST(len(lines) AS BIGINT) AS n_lines,
            CAST(len(kept) AS BIGINT) AS n_kept,
            CAST(doc_ok AND len(kept) >= 3 AS INT) AS doc_kept
          FROM k""",
    "q175_chat_render" ->
      s"""WITH $chatTurnsCtesSql, lagd AS (
           SELECT doc_id, sent_idx, role, content,
             CASE WHEN role = lag(role) OVER
               (PARTITION BY doc_id ORDER BY sent_idx) THEN 1 ELSE 0 END AS dup
           FROM turns
         ), agg AS (
           SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_turns,
             string_agg('<|' || role || '|>' || content || '<|end|>', ''
               ORDER BY sent_idx) AS rendered,
             CAST(min(CASE WHEN role IN ('system', 'user', 'assistant')
               THEN 1 ELSE 0 END) AS INT) AS v_roles,
             CAST(CASE WHEN arg_min(role, sent_idx) IN ('system', 'user')
               THEN 1 ELSE 0 END AS INT) AS v_starts,
             CAST(CASE WHEN max(dup) = 0 THEN 1 ELSE 0 END AS INT) AS v_alternates,
             CAST(CASE WHEN arg_max(role, sent_idx) = 'assistant'
               THEN 1 ELSE 0 END AS INT) AS v_ends,
             CAST(min(CASE WHEN trim(content) <> '' THEN 1 ELSE 0 END) AS INT)
               AS v_nonempty
           FROM lagd GROUP BY doc_id
         )
         SELECT doc_id, n_turns, rendered, v_roles, v_starts, v_alternates,
           v_ends, v_nonempty,
           CAST(v_roles = 1 AND v_starts = 1 AND v_alternates = 1
             AND v_ends = 1 AND v_nonempty = 1 AS INT) AS valid
         FROM agg""",
    "q177_curation_v7" ->
      s"""WITH aug AS (SELECT doc_id, $webAugmentSql AS text FROM documents),
         ${c4CtesSql("aug")}, c4 AS (
           SELECT doc_id, array_to_string(kept, chr(10)) AS text
           FROM k WHERE doc_ok AND len(kept) >= 3
         ), ${gopherCountersSql("c4")}, surv AS (
           SELECT c4.doc_id, c4.text, d.lang
           FROM c4 JOIN c USING (doc_id) JOIN documents d USING (doc_id)
           WHERE ${gopherPassSql(10, 90)}
         ),
         t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM surv),
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
           SELECT a.doc_id, s.lang, a.n_tokens, a.nll_micro,
             CAST(a.nll_micro // a.n_tokens AS BIGINT) AS ppt_micro
           FROM agg a JOIN surv s USING (doc_id)),
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
           CASE WHEN p.ppt_micro <= cc.c1 THEN 'head'
                WHEN p.ppt_micro <= cc.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM perdoc p JOIN cuts cc USING (lang)
         WHERE CASE WHEN p.ppt_micro <= cc.c1 THEN 'head'
                WHEN p.ppt_micro <= cc.c2 THEN 'middle'
                ELSE 'tail' END <> 'tail'""",
    "q178_preference_pairs" ->
      s"""WITH aug AS (
           ${TextQueries.sentAugSql("documents", "text")}
         ), ${TextQueries.sentSplitCtesSql("aug")}, c AS (
           SELECT doc_id, sent_idx, CAST(length(sentence) AS BIGINT) AS score
           FROM x
         ), ch AS (
           SELECT doc_id, sent_idx AS chosen_id, score AS chosen_score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, sent_idx) AS rn
           FROM c
         ), rj AS (
           SELECT doc_id, sent_idx AS rejected_id, score AS rejected_score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score ASC, sent_idx) AS rn
           FROM c
         )
         SELECT ch.doc_id, chosen_id, rejected_id, chosen_score,
           rejected_score, chosen_score - rejected_score AS margin
         FROM ch JOIN rj ON ch.doc_id = rj.doc_id
         WHERE ch.rn = 1 AND rj.rn = 1
           AND chosen_score - rejected_score >= 1""",
    "q179_loss_mask" ->
      s"""WITH $chatTurnsCtesSql, p AS (
           SELECT doc_id, sent_idx, role, content,
             CAST(length(role) + 4 + length(content) + 7 AS BIGINT) AS piece,
             CAST(length(role) + 4 AS BIGINT) AS head
           FROM turns
         ), w AS (
           SELECT doc_id, sent_idx, role, content, head,
             COALESCE(SUM(piece) OVER (PARTITION BY doc_id ORDER BY sent_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
           FROM p
         )
         SELECT doc_id, sent_idx,
           CAST(bef + head AS BIGINT) AS span_start,
           CAST(bef + head + length(content) AS BIGINT) AS span_end
         FROM w WHERE role = 'assistant'""",
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
