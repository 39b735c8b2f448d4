package graft.queries

import graft.Tables
import graft.functions.{Portable, TextFunctions}
import graft.operators.Metrics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Eval-metric / drift query pack — the measurement tail of the eval
  * pipeline:
  *
  *   - q192: ROC-AUC (tie-corrected Mann–Whitney) of document length as
  *     a predictor of English — the "is this feature discriminative?"
  *     diagnostic, exact to the micro-unit.
  *   - q193: per-user ranked-retrieval metrics (MRR / DCG@10 / NDCG@10 /
  *     precision@10 / recall@10) over value-ranked events against a
  *     deterministic relevance rule.
  *   - q194: two-sample Kolmogorov–Smirnov drift between the purchase
  *     and view value distributions.
  *   - q195: Cohen's kappa between two deterministic document "raters"
  *     (char-length rule vs token-count rule) — annotation-QA.
  *   - q197: composition — the q72 BM25 top-10 evaluated with
  *     [[Metrics.retrievalMetrics]] against graded term-coverage
  *     relevance (how many of the 4 query terms the doc contains).
  */
object MetricsQueries {

  def q192RocAuc(s: SparkSession, d: String): DataFrame =
    Metrics.rocAuc(
      Tables.documents(s, d)
        .select(col("n_chars"), (col("lang") === "en").as("is_en")),
      "n_chars", "is_en")

  def q193RetrievalMetrics(s: SparkSession, d: String): DataFrame =
    Metrics.retrievalMetrics(
      RelationalQueries.events(s, d)
        .select(col("user_id"), col("event_id"),
          Portable.cents(col("value")).as("cents"),
          (pmod(col("event_id"), lit(5)) === 0).cast("long").as("rel")),
      "user_id", "rel", Seq(col("cents").desc, col("event_id")), k = 10)

  def q194KsDrift(s: SparkSession, d: String): DataFrame =
    Metrics.ksTwoSample(
      RelationalQueries.events(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .select(Portable.cents(col("value")).as("cents"),
          (col("event_type") === "purchase").as("is_a")),
      "cents", "is_a")

  def q195CohenKappa(s: SparkSession, d: String): DataFrame =
    Metrics.cohenKappa(
      Tables.documents(s, d).select(
        when(col("n_chars") > 300, "long").otherwise("short").as("rater_a"),
        when(TextFunctions.tokenCount(col("text")) > 50, "long")
          .otherwise("short").as("rater_b")),
      "rater_a", "rater_b")

  // Fleiss' kappa over a THREE-rater panel: the q195 pair of rule-raters
  // plus a third (raw trimmed length), each labeling every document
  // long/short — exactly 3 ratings per item, the fixed-n panel the
  // statistic requires. "Do the three length heuristics constitute one
  // consistent annotator pool?"
  def q217FleissKappa(s: SparkSession, d: String): DataFrame = {
    val ratings = Tables.documents(s, d).select(col("doc_id"),
        explode(array(
          when(col("n_chars") > 300, "long").otherwise("short"),
          when(TextFunctions.tokenCount(col("text")) > 50, "long")
            .otherwise("short"),
          when(length(trim(col("text"))) > 290, "long").otherwise("short")))
          .as("category"))
    Metrics.fleissKappa(ratings, "doc_id", "category")
  }

  // The q212 report's one-row summary: micro accuracy + the macro
  // averages under the explicit exclude-and-count NULL policy — "one
  // number across classes" for the same NB-vs-truth question.
  def q220MacroReport(s: SparkSession, d: String): DataFrame = {
    val scored = TextQueries.q113NbClassify(s, d)
    Metrics.classificationSummary(
      scored.join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id")),
      "lang", "label_pred")
  }

  def q200ChiSquare(s: SparkSession, d: String): DataFrame =
    Metrics.chiSquareIndependence(Tables.documents(s, d), "lang", "source")

  def q202Concentration(s: SparkSession, d: String): DataFrame =
    Metrics.concentrationProfile(
      Tables.orders(s, d).select(col("o_custkey"),
        Portable.cents(col("o_totalprice")).as("cents")),
      "o_custkey", "cents")

  // Same discriminator construction as q192 — AP beside AUC on the one
  // imbalanced-classes question ("en" is the minority at every SF).
  def q208AveragePrecision(s: SparkSession, d: String): DataFrame =
    Metrics.averagePrecision(
      Tables.documents(s, d)
        .select(col("n_chars"), (col("lang") === "en").as("is_en")),
      "n_chars", "is_en")

  // Deterministic pseudo-forecast: p = min(1e6, 500·n_chars) — a length-
  // monotone "probability" of being English, graded by Brier + ECE.
  def q209ProbScorecard(s: SparkSession, d: String): DataFrame =
    Metrics.probScorecard(
      Tables.documents(s, d).filter(col("n_chars").isNotNull)
        .select(least(lit(1000000L), col("n_chars").cast("long") * 500L)
          .as("p_micro"), (col("lang") === "en").as("is_en")),
      "p_micro", "is_en", bins = 10)

  // Bias audit of the length-rule "quality classifier" across sources:
  // does the filter select / hit / false-alarm uniformly, or does one
  // source pay for the others?
  def q210FairnessReport(s: SparkSession, d: String): DataFrame =
    Metrics.fairnessReport(
      Tables.documents(s, d).select(col("source"),
        (col("lang") === "en").as("is_en"),
        (col("n_chars") > 300).as("pred_en")),
      "source", "is_en", "pred_en")

  // Paired comparison of the q195 raters as CLASSIFIERS of English:
  // does the char rule beat the token rule on the same documents, or is
  // the difference inside discordance noise?
  def q211Mcnemar(s: SparkSession, d: String): DataFrame =
    Metrics.mcnemar(
      Tables.documents(s, d).select(
        ((col("n_chars") > 300) === (col("lang") === "en")).as("a_ok"),
        ((TextFunctions.tokenCount(col("text")) > 50) ===
          (col("lang") === "en")).as("b_ok")),
      "a_ok", "b_ok")

  // Composition: the q113 NB classifier's held-out predictions joined
  // back to their true language, graded per class — the classifier era's
  // missing scoreboard (which language does the model break on?).
  def q212ClassReport(s: SparkSession, d: String): DataFrame = {
    val scored = TextQueries.q113NbClassify(s, d)
    Metrics.classificationReport(
      scored.join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id")),
      "lang", "label_pred")
  }

  // The q212 confusion cells collapsed into the one balance-robust
  // scalar the per-class report leaves out: multiclass MCC of the q113
  // NB classifier against the true language (fills the q196 numbering
  // hole with the metric the suite lacked).
  def q196Mcc(s: SparkSession, d: String): DataFrame = {
    val scored = TextQueries.q113NbClassify(s, d)
    Metrics.matthewsCorrelation(
      scored.join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id")),
      "lang", "label_pred")
  }

  // Composition: the q143 funnel's completion verdict tested for cohort
  // independence — "did the A/B split move purchase conversion, or is
  // the lift inside chance?" — the events era chained into the stats
  // era. Only funnel STARTERS enter the test (q143's emit contract).
  def q213FunnelAb(s: SparkSession, d: String): DataFrame = {
    val fun = graft.operators.Events.funnelSteps(
      RelationalQueries.events(s, d), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), Some("7 days"))
    Metrics.chiSquareIndependence(
      fun.select((pmod(col("user_id"), lit(2)) === 0).as("cohort"),
        (col("furthest_step") >= 3).as("converted")),
      "cohort", "converted")
  }

  // Deciles of the q192 discriminator: where do the English documents
  // concentrate when ranked by length — the targeting view of the curve
  // q208 integrates.
  def q216GainsTable(s: SparkSession, d: String): DataFrame =
    Metrics.gainsTable(
      Tables.documents(s, d)
        .select(col("n_chars"), (col("lang") === "en").as("is_en")),
      "n_chars", "is_en", buckets = 10)

  def q205PsiDrift(s: SparkSession, d: String): DataFrame =
    Metrics.psi(
      RelationalQueries.events(s, d)
        .select(pmod(Portable.cents(col("value")), lit(8)).as("band"),
          (pmod(col("user_id"), lit(2)) === 0).as("is_a")),
      "band", "is_a")

  def q203JsdDrift(s: SparkSession, d: String): DataFrame =
    Metrics.jsDivergence(
      RelationalQueries.events(s, d).select(col("event_type"),
        (pmod(col("user_id"), lit(2)) === 0).as("is_a")),
      "event_type", "is_a")

  /** q72's query terms — the composition grades its own search output. */
  private val SearchTerms = Seq("spark", "hash", "merge", "window")

  def q197SearchEval(s: SparkSession, d: String): DataFrame = {
    val res = TextQueries.q72Bm25(s, d)
    // graded relevance: how many DISTINCT query terms the doc contains
    // (0..4) under the engine tokenizer — joined onto the top-10 only
    // (result-list-sized, broadcastable)
    val rel = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("_t"))
      .filter(col("_t").isin(SearchTerms.map(x => x: Any): _*))
      .groupBy("doc_id").agg(countDistinct(col("_t")).as("rel"))
    Metrics.retrievalMetrics(
      res.join(rel, Seq("doc_id"), "left")
        .select(lit("q0").as("query_id"), col("doc_id"), col("score_micro"),
          coalesce(col("rel"), lit(0L)).as("rel")),
      "query_id", "rel", Seq(col("score_micro").desc, col("doc_id")), k = 10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q192_roc_auc" -> q192RocAuc,
    "q193_retrieval_metrics" -> q193RetrievalMetrics,
    "q194_ks_drift" -> q194KsDrift,
    "q195_cohen_kappa" -> q195CohenKappa,
    "q197_search_eval" -> q197SearchEval,
    "q200_chi_square" -> q200ChiSquare,
    "q202_concentration" -> q202Concentration,
    "q203_jsd_drift" -> q203JsdDrift,
    "q205_psi_drift" -> q205PsiDrift,
    "q208_average_precision" -> q208AveragePrecision,
    "q209_prob_scorecard" -> q209ProbScorecard,
    "q210_fairness_report" -> q210FairnessReport,
    "q196_mcc" -> q196Mcc,
    "q217_fleiss_kappa" -> q217FleissKappa,
    "q220_macro_report" -> q220MacroReport,
    "q211_mcnemar" -> q211Mcnemar,
    "q212_class_report" -> q212ClassReport,
    "q213_funnel_ab" -> q213FunnelAb,
    "q216_gains_table" -> q216GainsTable)

  private val q192OracleSql: String =
    """WITH s AS (SELECT n_chars AS s,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE n_chars IS NOT NULL),
      g AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
        FROM s GROUP BY 1),
      cu AS (SELECT *, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum FROM g),
      a AS (SELECT CAST(coalesce(sum(p), 0) AS BIGINT) AS n_pos,
          CAST(coalesce(sum(c - p), 0) AS BIGINT) AS n_neg,
          coalesce(sum(CAST(p AS HUGEINT) * (2 * (cum - c) + c + 1)),
            CAST(0 AS HUGEINT)) AS r2
        FROM cu)
      SELECT n_pos, n_neg,
        CASE WHEN n_pos > 0 AND n_neg > 0
          THEN CAST((1000000 * (r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)))
                 // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
        END AS auc_micro
      FROM a"""

  /** The [[Metrics.retrievalMetrics]] replay over a `res(q, r, rk, ik)`
    * relation (query, gain, rank, ideal rank) at `k` — the per-position
    * discount literals are printed from the SAME doubles the plan uses,
    * so the term arithmetic is bit-identical. Shared by q193 and the
    * q197 composition. */
  private[queries] def retrievalTailSql(k: Int, from: String): String = {
    def term(rkCol: String) = (1 to k).map { i =>
      s"WHEN $rkCol = $i AND r > 0 THEN CAST(round(1000000.0 * CAST(r AS DOUBLE) / ${Metrics.discountSqlLiteral(i)}) AS BIGINT)"
    }.mkString("CASE ", " ", " ELSE 0 END")
    s"""agg AS (SELECT q,
          CAST(count(*) AS BIGINT) AS n_results,
          CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
          min(CASE WHEN r > 0 THEN rk END) AS first_rk,
          CAST(sum(${term("rk")}) AS BIGINT) AS dcg_micro,
          CAST(sum(${term("ik")}) AS BIGINT) AS idcg_micro,
          CAST(sum(CASE WHEN rk <= $k AND r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM $from GROUP BY q),
      fin AS (SELECT q, n_results, n_rel,
          CASE WHEN first_rk IS NOT NULL
            THEN CAST(1000000 // first_rk AS BIGINT) ELSE 0 END AS mrr_micro,
          dcg_micro, idcg_micro,
          CASE WHEN idcg_micro > 0
            THEN CAST((CAST(1000000 AS HUGEINT) * dcg_micro) // idcg_micro AS BIGINT)
            ELSE 0 END AS ndcg_micro,
          CAST((CAST(1000000 AS HUGEINT) * hits) // $k AS BIGINT) AS precision_micro,
          CASE WHEN n_rel > 0
            THEN CAST((CAST(1000000 AS HUGEINT) * hits) // n_rel AS BIGINT)
          END AS recall_micro
        FROM agg)"""
  }

  private val q193OracleSql: String =
    s"""WITH e AS (SELECT user_id AS q, event_id,
          CAST(round(value * 100) AS BIGINT) AS cents,
          CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS r
        FROM events),
      res AS (SELECT q, r,
          CAST(row_number() OVER (PARTITION BY q
            ORDER BY cents DESC, event_id) AS BIGINT) AS rk
        FROM e),
      res2 AS (SELECT q, r, rk,
          CAST(row_number() OVER (PARTITION BY q
            ORDER BY r DESC, rk) AS BIGINT) AS ik
        FROM res),
      ${retrievalTailSql(10, "res2")}
      SELECT q AS user_id, n_results, n_rel, mrr_micro, dcg_micro,
        idcg_micro, ndcg_micro, precision_micro, recall_micro
      FROM fin"""

  private val q194OracleSql: String =
    """WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type IN ('purchase', 'view')),
      g AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
          CAST(sum(1 - a) AS BIGINT) AS cb
        FROM s GROUP BY 1),
      c AS (SELECT v,
          CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS fa,
          CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS fb
        FROM g),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(cb) AS BIGINT) AS nb FROM g),
      d AS (SELECT c.v, t.na, t.nb,
          abs(CAST(c.fa AS HUGEINT) * t.nb - CAST(c.fb AS HUGEINT) * t.na) AS dd
        FROM c, t),
      m AS (SELECT max(dd) AS dm FROM d)
      SELECT max(d.na) AS n_a, max(d.nb) AS n_b,
        CASE WHEN max(d.na) > 0 AND max(d.nb) > 0
          THEN CAST((1000000 * max(d.dd))
                 // (CAST(max(d.na) AS HUGEINT) * max(d.nb)) AS BIGINT)
        END AS d_micro,
        max(d.v) AS at_value
      FROM d, m WHERE d.dd = m.dm"""

  private val q195OracleSql: String =
    """WITH r AS (SELECT
          CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS a,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) > 50
            THEN 'long' ELSE 'short' END AS b
        FROM documents),
      cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1, 2),
      t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
          CAST(coalesce(sum(CASE WHEN a = b THEN n ELSE 0 END), 0) AS BIGINT)
            AS agree
        FROM cm),
      pe AS (SELECT coalesce(sum(CAST(ma.m AS HUGEINT) * mb.m),
            CAST(0 AS HUGEINT)) AS pe
        FROM (SELECT a, CAST(sum(n) AS BIGINT) AS m FROM cm GROUP BY 1) ma
        JOIN (SELECT b, CAST(sum(n) AS BIGINT) AS m FROM cm GROUP BY 1) mb
          ON ma.a = mb.b)
      SELECT t.n, t.agree,
        CASE WHEN t.n > 0
          THEN CAST((1000000 * CAST(t.agree AS HUGEINT)) // t.n AS BIGINT)
        END AS po_micro,
        CASE WHEN t.n = 0 THEN NULL
             WHEN CAST(t.n AS HUGEINT) * t.n - pe.pe = 0 THEN 1000000
             ELSE CAST((1000000 * (CAST(t.n AS HUGEINT) * t.agree - pe.pe))
                    // (CAST(t.n AS HUGEINT) * t.n - pe.pe) AS BIGINT)
        END AS kappa_micro
      FROM t, pe"""

  /** q197 oracle: the whole q72 oracle as a CTE (nested WITH — the
    * composition convention), graded term-coverage relevance over the
    * engine tokenizer, then the shared retrieval-metrics tail on the
    * one-query result list. */
  private def q197OracleSql(q72Oracle: String): String =
    s"""WITH topk AS ($q72Oracle),
      rel AS (SELECT u.doc_id, CAST(count(DISTINCT u.tok) AS BIGINT) AS rel
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM documents) u
        WHERE u.tok IN ('spark', 'hash', 'merge', 'window')
        GROUP BY 1),
      base AS (SELECT 'q0' AS q, t.doc_id, t.score_micro,
          CAST(coalesce(r.rel, 0) AS BIGINT) AS r
        FROM topk t LEFT JOIN rel r ON r.doc_id = t.doc_id),
      res AS (SELECT q, r,
          CAST(row_number() OVER (PARTITION BY q
            ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rk
        FROM base),
      res2 AS (SELECT q, r, rk,
          CAST(row_number() OVER (PARTITION BY q
            ORDER BY r DESC, rk) AS BIGINT) AS ik
        FROM res),
      ${retrievalTailSql(10, "res2")}
      SELECT q AS query_id, n_results, n_rel, mrr_micro, dcg_micro,
        idcg_micro, ndcg_micro, precision_micro, recall_micro
      FROM fin"""

  /** The split-division chi-square replay over a `cells(a, b)` relation —
    * each term's `10⁶·d²//nrc` is evaluated as
    * `10⁶·(d²//nrc) + (10⁶·(d² mod nrc))//nrc` in BOTH engines (identical
    * floors, both halves HUGEINT-safe). Shared by q200 and the q213
    * composition (the retrievalTailSql discipline: the statistic is
    * defined once). Expects the caller's WITH chain to end before it;
    * emits the final SELECT. */
  private[queries] def chiSquareTailSql(from: String): String =
    s"""cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
          FROM $from WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1, 2),
      ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM cm GROUP BY 1),
      cb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM cm GROUP BY 1),
      tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t,
          CAST(count(DISTINCT a) AS BIGINT) AS r,
          CAST(count(DISTINCT b) AS BIGINT) AS c FROM cm),
      grid AS (SELECT ra.ra, cb.cb, tot.t, tot.r, tot.c,
          CAST(coalesce(cm.n, 0) AS HUGEINT) * tot.t
            - CAST(ra.ra AS HUGEINT) * cb.cb AS d
        FROM ra CROSS JOIN cb CROSS JOIN tot
        LEFT JOIN cm ON cm.a = ra.a AND cm.b = cb.b),
      terms AS (SELECT t, r, c,
          1000000 * ((d * d) // (CAST(t AS HUGEINT) * ra * cb))
            + (1000000 * ((d * d) % (CAST(t AS HUGEINT) * ra * cb)))
              // (CAST(t AS HUGEINT) * ra * cb) AS term
        FROM grid)
      SELECT coalesce(max(t), 0) AS n,
        coalesce((max(r) - 1) * (max(c) - 1), 0) AS dof,
        CASE WHEN (max(r) - 1) * (max(c) - 1) > 0
          THEN CAST(sum(term) AS BIGINT) END AS chi2_micro,
        CASE WHEN (max(r) - 1) * (max(c) - 1) > 0
          THEN CAST(sum(term)
                 // (CAST(max(t) AS HUGEINT) * (least(max(r), max(c)) - 1))
               AS BIGINT)
        END AS cramers_v2_micro
      FROM terms"""

  private val q200OracleSql: String =
    s"""WITH cells AS (SELECT lang AS a, source AS b FROM documents),
      ${chiSquareTailSql("cells")}"""

  private val q202OracleSql: String =
    """WITH g AS (SELECT o_custkey AS k,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS w
        FROM orders GROUP BY 1),
      r AS (SELECT *, CAST(row_number() OVER (ORDER BY w, k) AS BIGINT) AS i
        FROM g),
      t AS (SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(count(*) AS BIGINT) AS n,
          CAST(max(w) AS BIGINT) AS top1,
          coalesce(sum(CAST(w AS HUGEINT) * w), CAST(0 AS HUGEINT)) AS sq,
          coalesce(sum(CAST(i AS HUGEINT) * w), CAST(0 AS HUGEINT)) AS iw
        FROM r),
      tt AS (SELECT CAST(coalesce(sum(w), 0) AS BIGINT) AS t10
        FROM (SELECT w FROM g ORDER BY w DESC, k LIMIT 10))
      SELECT coalesce(t.n, 0) AS n_keys, coalesce(t.tw, 0) AS total,
        CASE WHEN t.n > 0 AND t.tw > 0
          THEN CAST((1000000 * (2 * t.iw - CAST(t.n + 1 AS HUGEINT) * t.tw))
                 // (CAST(t.n AS HUGEINT) * t.tw) AS BIGINT) END AS gini_micro,
        CASE WHEN t.tw > 0
          THEN CAST((1000000 * t.sq)
                 // (CAST(t.tw AS HUGEINT) * t.tw) AS BIGINT) END AS hhi_micro,
        CASE WHEN t.tw > 0
          THEN CAST((1000000 * CAST(t.top1 AS HUGEINT)) // t.tw AS BIGINT)
        END AS top1_micro,
        CASE WHEN t.tw > 0
          THEN CAST((1000000 * CAST(tt.t10 AS HUGEINT)) // t.tw AS BIGINT)
        END AS top10_micro
      FROM t, tt"""

  /** q203 oracle — the JSD terms replay the IDENTICAL IEEE expression
    * tree (explicit double casts on every division; `ln` is the one
    * transcendental — the q19/q92 exposure); per-value terms are
    * non-negative by the log-sum inequality, so HALF_UP and
    * half-away-from-zero rounding agree. */
  private val q203OracleSql: String =
    """WITH s AS (SELECT event_type AS v,
          CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type IS NOT NULL),
      g AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
          CAST(sum(1 - a) AS BIGINT) AS cb FROM s GROUP BY 1),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(cb) AS BIGINT) AS nb FROM g),
      terms AS (SELECT t.na, t.nb,
          CAST(round(1000000.0 * (
            CASE WHEN g.ca > 0 THEN 0.5 * (CAST(g.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
              * ln(2.0 * (CAST(g.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                  / ((CAST(g.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                     + (CAST(g.cb AS DOUBLE) / CAST(t.nb AS DOUBLE)))) ELSE 0.0 END
            + CASE WHEN g.cb > 0 THEN 0.5 * (CAST(g.cb AS DOUBLE) / CAST(t.nb AS DOUBLE))
              * ln(2.0 * (CAST(g.cb AS DOUBLE) / CAST(t.nb AS DOUBLE))
                  / ((CAST(g.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                     + (CAST(g.cb AS DOUBLE) / CAST(t.nb AS DOUBLE)))) ELSE 0.0 END
          )) AS BIGINT) AS term
        FROM g, t)
      SELECT max(na) AS n_a, max(nb) AS n_b,
        CASE WHEN max(na) > 0 AND max(nb) > 0
          THEN CAST(sum(term) AS BIGINT) END AS jsd_micro
      FROM terms"""

  /** q205 oracle — the PSI terms replay the identical IEEE tree; cents
    * mirror `Portable.cents` (`round(value*100)`). */
  private val q205OracleSql: String =
    """WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) % 8 AS v,
          CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
        FROM events WHERE value IS NOT NULL),
      g AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
          CAST(sum(1 - a) AS BIGINT) AS cb FROM s GROUP BY 1),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(cb) AS BIGINT) AS nb FROM g),
      terms AS (SELECT t.na, t.nb,
          CAST(round(1000000.0 * (
            ((CAST(g.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
             - (CAST(g.cb AS DOUBLE) / CAST(t.nb AS DOUBLE)))
            * ln((CAST(g.ca AS DOUBLE) / CAST(t.na AS DOUBLE))
                 / (CAST(g.cb AS DOUBLE) / CAST(t.nb AS DOUBLE)))
          )) AS BIGINT) AS term
        FROM g, t)
      SELECT max(na) AS n_a, max(nb) AS n_b,
        CASE WHEN max(na) > 0 AND max(nb) > 0
          THEN CAST(sum(term) AS BIGINT) END AS psi_micro
      FROM terms"""

  private val q208OracleSql: String =
    """WITH s AS (SELECT n_chars AS s,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE n_chars IS NOT NULL),
      g AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
        FROM s GROUP BY 1),
      cu AS (SELECT *, CAST(sum(c) OVER (ORDER BY s DESC) AS BIGINT) AS cn,
          CAST(sum(p) OVER (ORDER BY s DESC) AS BIGINT) AS cp FROM g),
      t AS (SELECT CAST(coalesce(sum(p), 0) AS BIGINT) AS npos,
          CAST(coalesce(sum(c - p), 0) AS BIGINT) AS nneg FROM g)
      SELECT max(t.npos) AS n_pos, max(t.nneg) AS n_neg,
        CASE WHEN max(t.npos) > 0
          THEN CAST(coalesce(sum(CASE WHEN cu.p > 0
              THEN (CAST(1000000 AS HUGEINT) * cu.p * cu.cp)
                   // (CAST(t.npos AS HUGEINT) * cu.cn) ELSE 0 END), 0)
               AS BIGINT)
        END AS ap_micro
      FROM t LEFT JOIN cu ON true"""

  private val q209OracleSql: String =
    """WITH s AS (SELECT least(1000000, CAST(n_chars AS BIGINT) * 500) AS p,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE n_chars IS NOT NULL),
      b AS (SELECT least((p * 10) // 1000000, 9) AS b,
          CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos,
          CAST(sum(p) AS HUGEINT) AS sp,
          sum(CAST(p - 1000000 * y AS HUGEINT) * (p - 1000000 * y)) AS sq
        FROM s GROUP BY 1)
      SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
        CAST(coalesce(sum(pos), 0) AS BIGINT) AS n_pos,
        CASE WHEN sum(n) > 0
          THEN CAST(sum(sq) // (CAST(1000000 AS HUGEINT) * sum(n)) AS BIGINT)
        END AS brier_micro,
        CASE WHEN sum(n) > 0
          THEN CAST(sum(abs(sp - CAST(1000000 AS HUGEINT) * pos)) // sum(n)
               AS BIGINT)
        END AS ece_micro
      FROM b"""

  private val q210OracleSql: String =
    """WITH r AS (SELECT source AS g,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
          CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS p
        FROM documents),
      cm AS (SELECT g, y, p, CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY 1, 2, 3),
      per AS (SELECT g, CAST(sum(n) AS BIGINT) AS n,
          CAST(sum(n * p) AS BIGINT) AS sel, CAST(sum(n * y) AS BIGINT) AS pos,
          CAST(sum(n * y * p) AS BIGINT) AS tp,
          CAST(sum(n * (1 - y) * p) AS BIGINT) AS fp
        FROM cm GROUP BY 1),
      pm AS (SELECT g, n,
          CAST((1000000 * CAST(sel AS HUGEINT)) // n AS BIGINT) AS sel_micro,
          CASE WHEN pos > 0
            THEN CAST((1000000 * CAST(tp AS HUGEINT)) // pos AS BIGINT)
          END AS tpr_micro,
          CASE WHEN n - pos > 0
            THEN CAST((1000000 * CAST(fp AS HUGEINT)) // (n - pos) AS BIGINT)
          END AS fpr_micro
        FROM per),
      pool AS (SELECT
          CAST((1000000 * CAST(sum(n * p) AS HUGEINT)) // sum(n) AS BIGINT)
            AS psel,
          CASE WHEN sum(n * y) > 0
            THEN CAST((1000000 * CAST(sum(n * y * p) AS HUGEINT))
                   // sum(n * y) AS BIGINT) END AS ptpr,
          CASE WHEN sum(n * (1 - y)) > 0
            THEN CAST((1000000 * CAST(sum(n * (1 - y) * p) AS HUGEINT))
                   // sum(n * (1 - y)) AS BIGINT) END AS pfpr
        FROM cm)
      SELECT pm.g AS source, pm.n, pm.sel_micro, pm.tpr_micro, pm.fpr_micro,
        pm.sel_micro - pool.psel AS sel_gap_micro,
        pm.tpr_micro - pool.ptpr AS tpr_gap_micro,
        pm.fpr_micro - pool.pfpr AS fpr_gap_micro
      FROM pm, pool"""

  private val q211OracleSql: String =
    """WITH r AS (SELECT
          ((n_chars > 300) = (lang = 'en')) AS a,
          ((len(string_split_regex(trim(text), '\s+')) > 50) = (lang = 'en'))
            AS b
        FROM documents)
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(coalesce(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS b_discordant,
        CAST(coalesce(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS c_discordant,
        CASE WHEN coalesce(sum(CASE WHEN a <> b THEN 1 ELSE 0 END), 0) > 0
          THEN CAST((1000000 *
                 CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                   - sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS HUGEINT)
                 * (sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                   - sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)))
               // (sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                   + sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)) AS BIGINT)
        END AS chi2_micro
      FROM r"""

  /** q212 oracle: the whole q113 oracle nested as a CTE (the composition
    * convention), truth re-joined on doc_id, then the exact-rational
    * per-class report. */
  private def q212OracleSql(q113Oracle: String): String =
    s"""WITH scored AS ($q113Oracle),
      truth AS (SELECT d.lang AS y, s.label_pred AS p
        FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
      cm AS (SELECT y, p, CAST(count(*) AS BIGINT) AS n
        FROM truth WHERE y IS NOT NULL AND p IS NOT NULL GROUP BY 1, 2),
      lt AS (SELECT y AS c, CAST(sum(n) AS BIGINT) AS support FROM cm GROUP BY 1),
      pt AS (SELECT p AS c, CAST(sum(n) AS BIGINT) AS predn FROM cm GROUP BY 1),
      dg AS (SELECT y AS c, CAST(sum(n) AS BIGINT) AS tp
        FROM cm WHERE y = p GROUP BY 1),
      f AS (SELECT coalesce(lt.c, pt.c) AS c,
          coalesce(lt.support, 0) AS support,
          coalesce(dg.tp, 0) AS tp,
          coalesce(pt.predn, 0) - coalesce(dg.tp, 0) AS fp,
          coalesce(lt.support, 0) - coalesce(dg.tp, 0) AS fn
        FROM lt FULL OUTER JOIN pt ON lt.c = pt.c
        LEFT JOIN dg ON dg.c = coalesce(lt.c, pt.c))
      SELECT c AS class, support, tp, fp, fn,
        CASE WHEN tp + fp > 0
          THEN CAST((1000000 * CAST(tp AS HUGEINT)) // (tp + fp) AS BIGINT)
        END AS precision_micro,
        CASE WHEN support > 0
          THEN CAST((1000000 * CAST(tp AS HUGEINT)) // support AS BIGINT)
        END AS recall_micro,
        CASE WHEN 2 * tp + fp + fn > 0
          THEN CAST((2000000 * CAST(tp AS HUGEINT)) // (2 * tp + fp + fn)
               AS BIGINT)
        END AS f1_micro
      FROM f"""

  /** q196 oracle: the q113 oracle nested as a CTE (the q212 composition
    * convention), then the Gorodkin R_K form over exact HUGEINT
    * marginals — the two square roots replay the engine's factored
    * `round(1e6 · num / (√f₁·√f₂))` double tree verbatim. */
  private def q196OracleSql(q113Oracle: String): String =
    s"""WITH scored AS ($q113Oracle),
      truth AS (SELECT d.lang AS y, s.label_pred AS p
        FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
      cm AS (SELECT y, p, CAST(count(*) AS BIGINT) AS n
        FROM truth WHERE y IS NOT NULL AND p IS NOT NULL GROUP BY 1, 2),
      lt AS (SELECT y AS c, CAST(sum(n) AS HUGEINT) AS t FROM cm GROUP BY 1),
      pt AS (SELECT p AS c, CAST(sum(n) AS HUGEINT) AS pn FROM cm GROUP BY 1),
      j AS (SELECT coalesce(lt.t, 0) AS t, coalesce(pt.pn, 0) AS pn
        FROM lt FULL OUTER JOIN pt ON lt.c = pt.c),
      m AS (SELECT CAST(coalesce(sum(t), 0) AS HUGEINT) AS s,
          CAST(count(*) AS BIGINT) AS n_classes,
          CAST(coalesce(sum(pn * t), 0) AS HUGEINT) AS spt,
          CAST(coalesce(sum(t * t), 0) AS HUGEINT) AS st2,
          CAST(coalesce(sum(pn * pn), 0) AS HUGEINT) AS sp2
        FROM j),
      dg AS (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) AS c
        FROM cm WHERE y = p)
      SELECT CAST(m.s AS BIGINT) AS n, CAST(dg.c AS BIGINT) AS n_correct,
        m.n_classes AS n_classes,
        CASE WHEN (m.s * m.s - m.sp2) > 0 AND (m.s * m.s - m.st2) > 0
          THEN CAST(round(1000000.0 *
                 (CAST(dg.c * m.s - m.spt AS DOUBLE)
                   / (sqrt(CAST(m.s * m.s - m.sp2 AS DOUBLE))
                      * sqrt(CAST(m.s * m.s - m.st2 AS DOUBLE)))))
               AS BIGINT)
        END AS mcc_micro
      FROM m, dg"""

  /** q220 oracle: the WHOLE q212 report oracle nested as a CTE, then the
    * identical one-row summary — micro accuracy as one rational, macros
    * as floor(Σ per-class-floored-micro / defined-count), DuckDB count()
    * over the nullable metric columns carrying the exclude-and-count
    * policy exactly as the engine does. */
  private def q220OracleSql(q212Oracle: String): String =
    s"""WITH rep AS ($q212Oracle)
      SELECT CAST(coalesce(sum(support), 0) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS n_classes,
        CASE WHEN coalesce(sum(support), 0) > 0
          THEN CAST((1000000 * CAST(coalesce(sum(tp), 0) AS HUGEINT))
                 // CAST(sum(support) AS HUGEINT) AS BIGINT)
        END AS accuracy_micro,
        CASE WHEN count(precision_micro) > 0
          THEN CAST(CAST(coalesce(sum(precision_micro), 0) AS HUGEINT)
                 // count(precision_micro) AS BIGINT)
        END AS macro_precision_micro,
        CASE WHEN count(recall_micro) > 0
          THEN CAST(CAST(coalesce(sum(recall_micro), 0) AS HUGEINT)
                 // count(recall_micro) AS BIGINT)
        END AS macro_recall_micro,
        CASE WHEN count(f1_micro) > 0
          THEN CAST(CAST(coalesce(sum(f1_micro), 0) AS HUGEINT)
                 // count(f1_micro) AS BIGINT)
        END AS macro_f1_micro,
        CAST(count(*) - count(precision_micro) AS BIGINT)
          AS n_undefined_precision,
        CAST(count(*) - count(recall_micro) AS BIGINT) AS n_undefined_recall
      FROM rep"""

  /** q217 oracle: the exact integer Fleiss rational — cells → per-item
    * sums (fixed n enforced by the engine's raise_error; the oracle just
    * uses min(ni)) → the cleared Gorodkin-style one-rational finale on
    * HUGEINT, floored with DuckDB's // (negative-safe like the engine's
    * pmod idiom). The three raters replay q195's rule idiom. */
  private val q217OracleSql: String =
    """WITH r AS (SELECT doc_id, unnest([
          CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) > 50
            THEN 'long' ELSE 'short' END,
          CASE WHEN len(trim(text)) > 290 THEN 'long' ELSE 'short' END]) AS c
        FROM documents
        -- pin the engine's NULL policy: fleissKappaFromCounts EXCLUDES
        -- NULL items, while a bare GROUP BY would keep a NULL group
        -- (r10 advice — latent divergence if doc_id ever carries NULLs)
        WHERE doc_id IS NOT NULL),
      cells AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY 1, 2),
      items AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS ni,
          CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2i
        FROM cells GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
          min(ni) AS nr, CAST(coalesce(sum(s2i), 0) AS HUGEINT) AS s2
        FROM items),
      c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
          CAST(coalesce(sum(CAST(cj AS HUGEINT) * cj), 0) AS HUGEINT) AS tt
        FROM (SELECT c, CAST(sum(n) AS BIGINT) AS cj FROM cells GROUP BY 1))
      SELECT t.n_items, CAST(coalesce(t.nr, 0) AS BIGINT) AS n_raters,
        c2.n_categories,
        CASE WHEN t.n_items = 0 OR t.nr < 2 THEN NULL
             WHEN (t.nr - 1) * (CAST(t.n_items AS HUGEINT) * t.nr
                    * t.n_items * t.nr - c2.tt) = 0 THEN 1000000
             ELSE CAST((1000000 * ((t.s2 - CAST(t.n_items AS HUGEINT) * t.nr)
                      * (CAST(t.n_items AS HUGEINT) * t.nr)
                    - c2.tt * (t.nr - 1)))
                 // ((t.nr - 1) * (CAST(t.n_items AS HUGEINT) * t.nr
                      * t.n_items * t.nr - c2.tt)) AS BIGINT)
        END AS kappa_micro
      FROM t, c2"""

  /** q213 oracle: the whole q143 funnel oracle nested as a CTE, then the
    * shared chi-square tail over (cohort, converted). */
  private def q213OracleSql(q143Oracle: String): String =
    s"""WITH fun AS ($q143Oracle),
      cells AS (SELECT (user_id % 2 = 0) AS a,
          (furthest_step >= 3) AS b FROM fun),
      ${chiSquareTailSql("cells")}"""

  private val q216OracleSql: String =
    """WITH s AS (SELECT n_chars AS s,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE n_chars IS NOT NULL),
      g AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
        FROM s GROUP BY 1),
      cu AS (SELECT *, CAST(sum(c) OVER (ORDER BY s DESC) AS BIGINT) AS cn
        FROM g),
      t AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nn,
          CAST(coalesce(sum(p), 0) AS BIGINT) AS pp FROM g),
      b AS (SELECT ((cu.cn - 1) * 10) // t.nn AS band,
          CAST(sum(cu.c) AS BIGINT) AS n, CAST(sum(cu.p) AS BIGINT) AS pos,
          max(t.nn) AS nn, max(t.pp) AS pp
        FROM cu, t GROUP BY 1),
      r AS (SELECT *, CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS cum_n,
          CAST(sum(pos) OVER (ORDER BY band) AS BIGINT) AS cum_pos
        FROM b)
      SELECT band, n, pos, cum_n, cum_pos,
        CASE WHEN pp > 0
          THEN CAST((1000000 * CAST(cum_pos AS HUGEINT)) // pp AS BIGINT)
        END AS gain_micro,
        CASE WHEN pp > 0 AND cum_n > 0
          THEN CAST((1000000 * CAST(cum_pos AS HUGEINT) * nn)
                 // (CAST(cum_n AS HUGEINT) * pp) AS BIGINT)
        END AS lift_micro
      FROM r"""

  val oracles: Map[String, String] = Map(
    "q216_gains_table" -> q216OracleSql,
    "q196_mcc" -> q196OracleSql(TextQueries.oracles("q113_nb_classify")),
    "q217_fleiss_kappa" -> q217OracleSql,
    "q220_macro_report" ->
      q220OracleSql(q212OracleSql(TextQueries.oracles("q113_nb_classify"))),
    "q212_class_report" -> q212OracleSql(TextQueries.oracles("q113_nb_classify")),
    "q213_funnel_ab" -> q213OracleSql(RelationalQueries.oracles("q143_funnel")),
    "q210_fairness_report" -> q210OracleSql,
    "q211_mcnemar" -> q211OracleSql,
    "q208_average_precision" -> q208OracleSql,
    "q209_prob_scorecard" -> q209OracleSql,
    "q200_chi_square" -> q200OracleSql,
    "q202_concentration" -> q202OracleSql,
    "q203_jsd_drift" -> q203OracleSql,
    "q205_psi_drift" -> q205OracleSql,
    "q192_roc_auc" -> q192OracleSql,
    "q193_retrieval_metrics" -> q193OracleSql,
    "q194_ks_drift" -> q194OracleSql,
    "q195_cohen_kappa" -> q195OracleSql,
    "q197_search_eval" -> q197OracleSql(TextQueries.oracles("q72_bm25_search")))
}
