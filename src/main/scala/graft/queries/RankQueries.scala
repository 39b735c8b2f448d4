package graft.queries

import graft.Tables
import graft.operators.{Rank, Relational}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ranking / mixture-allocation query pack — the RLHF-leaderboard and
  * data-mixing tail of the LLM pipeline surface:
  *
  *   - q184: Bradley-Terry strength ratings from pairwise outcomes
  *     (here: within-order quantity duels between parts — the
  *     basket-preference shape), fixed MM rounds, integer micro-units,
  *     replayed in DuckDB as an unrolled CTE chain (the q132 pattern).
  *   - q185: UniMax epoch-capped token-budget allocation across the
  *     corpus sources, budget = half the corpus (derived in-query, so
  *     every scale factor exercises a mixed capped/uncapped profile).
  *   - q187: composition — the q178 DPO preference pairs feed a
  *     Bradley-Terry leaderboard over sentence positions (chosen beats
  *     rejected), chaining the chat era into the ranking era.
  */
object RankQueries {

  /** Within-order duels: for every order, each line's part "beats" every
    * other line's part bought in strictly smaller quantity (same-part
    * duels excluded). Group-keyed self-join — candidates bounded by
    * order size squared (the q158 co-occurrence shape), never
    * vocabulary- or corpus-crossed. */
  private def partDuels(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("_o"), col("l_partkey"), col("l_quantity"))
    li.select(col("_o"), col("l_partkey").as("_pw"), col("l_quantity").as("_qw"))
      .join(li.select(col("_o"), col("l_partkey").as("_pl"), col("l_quantity").as("_ql")),
        Seq("_o"))
      .filter(col("_qw") > col("_ql") && col("_pw") =!= col("_pl"))
      .select(col("_pw").as("winner"), col("_pl").as("loser"))
  }

  /** Diagnostic handle for [[graft.tools.StageTimer]]'s BT-family
    * attribution — the gate's exact duel frame, nothing more. */
  private[graft] def partDuelsForTiming(s: SparkSession, d: String): DataFrame =
    partDuels(s, d)

  def q184BradleyTerry(s: SparkSession, d: String): DataFrame =
    Rank.bradleyTerry(partDuels(s, d), "winner", "loser", rounds = 6)

  // UniMax allocation across LANGUAGES — the paper's own scenario: a
  // training budget LARGER than the corpus (2.5×, derived in-query via a
  // 1-row aggregate collect — driver-side scalar, the operator itself
  // never sees corpus rows past its one aggregation) with a 3-epoch cap.
  // At every SF's language mix the four small languages hit their
  // 3-epoch cap and `en` takes the equal-share remainder — both arms of
  // the water-filling live in the gate.
  def q185Unimax(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
    val budget = docs.agg(sum(toks).as("t")).head().getLong(0) * 5 / 2
    Relational.unimaxAllocation(docs.select(col("lang"), toks.as("_t")),
      "lang", "_t", budget, maxEpochs = 3)
  }

  // Temperature-sampled mixture (α = 1/2) across languages — the
  // classical multilingual schedule next to q185's UniMax: half the
  // corpus as budget, √-weights flatten en's dominance (its epochs_micro
  // lands well under the small languages').
  def q207TemperatureMix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
    val budget = docs.agg(sum(toks).as("t")).head().getLong(0) / 2
    Relational.temperatureAllocation(
      docs.select(col("lang"), toks.as("_t")), "lang", "_t", budget)
  }

  // Composition: DPO preference pairs (q178) -> Bradley-Terry
  // leaderboard over sentence POSITIONS (the chosen sent_idx beats the
  // rejected one, one duel per prompt).
  def q187PreferenceLeaderboard(s: SparkSession, d: String): DataFrame =
    Rank.bradleyTerry(
      WebQueries.q178PreferencePairs(s, d)
        .select(col("chosen_id").as("winner"), col("rejected_id").as("loser")),
      "winner", "loser", rounds = 4)

  // Composition: UniMax allocation DRIVES the corpus draw — 1-epoch cap
  // and a 75%-of-corpus budget, so small languages keep ALL their
  // documents (capped at one epoch) and `en` is downsampled to the
  // equal-share remainder under the deterministic md5 draw order
  // (`tokenBudgetSample`) — the full data-mixing act in one gate. The
  // per-language budgets ride a languages-sized collect (model-sized,
  // same as the budget scalar).
  def q189UnimaxDraw(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
    val budget = docs.agg(sum(toks).as("t")).head().getLong(0) * 3 / 4
    val alloc = Relational.unimaxAllocation(docs.select(col("lang"), toks.as("_t")),
      "lang", "_t", budget, maxEpochs = 1)
    val budgets = alloc.select(col("source"), col("allocated_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).filter(_._2 > 0).toSeq.sortBy(_._1)
    Relational.tokenBudgetSample(
      docs.withColumn("n_tokens",
        graft.functions.TextFunctions.tokenCount(col("text"))),
      "lang", "doc_id", "n_tokens", budgets)
  }

  // pass@k over the events table — problems = users, samples = their
  // events, "passed" = a deterministic 25% predicate on the event id;
  // n per user is event-volume-sized, so the n >= 10 floor holds at
  // every SF. k = 1 (= c/n exactly) and k = 10.
  def q190PassAtK(s: SparkSession, d: String): DataFrame =
    Rank.passAtK(
      RelationalQueries.events(s, d)
        .select(col("user_id"), (pmod(col("event_id"), lit(4)) === 0).as("pass")),
      "user_id", "pass", Seq(1, 10))
      .filter(col("n") >= 10)

  // Leaderboard-agreement diagnostic: Spearman between the q184 BT
  // ratings and the raw win RATE per item — "does the model-based
  // ordering agree with the naive one?" in one exact-integer number.
  def q191LeaderboardAgreement(s: SparkSession, d: String): DataFrame = {
    val bt = Rank.bradleyTerry(partDuels(s, d), "winner", "loser", rounds = 6)
    Rank.spearmanCorr(
      bt.select(col("item_id"), col("rating_micro"),
        expr("(1000000 * wins) div comparisons").as("winrate_micro")),
      "rating_micro", "winrate_micro", "item_id")
  }

  // Annotation-QA over the duel graph: every majority-preference
  // 3-cycle among part BUCKETS (pmod 100 — a dense tournament where
  // near-tied buckets produce genuine cycles at every SF). A clean
  // transitive signal would emit zero rows; the cycle rate here is the
  // "don't trust the q184 board blindly" diagnostic.
  def q204PreferenceCycles(s: SparkSession, d: String): DataFrame =
    Rank.preferenceCycles(
      partDuels(s, d).select(pmod(col("winner"), lit(100)).as("winner"),
        pmod(col("loser"), lit(100)).as("loser")),
      "winner", "loser")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_bradley_terry" -> q184BradleyTerry,
    "q204_preference_cycles" -> q204PreferenceCycles,
    "q207_temperature_mix" -> q207TemperatureMix,
    "q185_unimax" -> q185Unimax,
    "q187_preference_leaderboard" -> q187PreferenceLeaderboard,
    "q189_unimax_draw" -> q189UnimaxDraw,
    "q190_pass_at_k" -> q190PassAtK,
    "q191_leaderboard_agreement" -> q191LeaderboardAgreement)

  /** The integer Bradley-Terry MM recurrence unrolled as CTEs over a
    * `comps(w, l)` relation — shared by q184 and the q187 composition
    * (the pageRankChainCtes discipline: "what BT computes" is defined
    * once). HUGEINT products mirror the engine's decimal(38,0); `//` on
    * the non-negative values equals the engine's pmod floor division.
    * Ends at `g$rounds(item, g)` + `items(item, comps)` + `wins`. */
  private def btRoundsSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""cc AS (SELECT least(w, l) AS i, greatest(w, l) AS j,
            CAST(count(*) AS BIGINT) AS n FROM comps GROUP BY 1, 2),
        dir AS (SELECT i AS item, j AS opp, n FROM cc
                UNION ALL SELECT j, i, n FROM cc),
        wins AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS wins
                 FROM comps GROUP BY 1),
        items AS MATERIALIZED (SELECT item, CAST(sum(n) AS BIGINT) AS comps
                 FROM dir GROUP BY 1),
        g0 AS MATERIALIZED (SELECT item, CAST(1000000 AS BIGINT) AS g FROM items)"""
    for (k <- 1 to rounds) {
      sb ++= s""",
        d$k AS (SELECT d.item,
            sum((CAST(d.n AS HUGEINT) * 1000000000000) // greatest(gi.g + gj.g, 1)) AS D
          FROM dir d
          JOIN g${k - 1} gi ON gi.item = d.item
          JOIN g${k - 1} gj ON gj.item = d.opp
          GROUP BY 1),
        p$k AS (SELECT i.item,
            CASE WHEN dd.D > 0
              THEN (CAST(coalesce(w.wins, 0) AS HUGEINT) * 1000000000000) // dd.D
              ELSE 0 END AS gp
          FROM items i
          JOIN d$k dd ON dd.item = i.item
          LEFT JOIN wins w ON w.item = i.item),
        t$k AS (SELECT sum(gp) AS T, count(*) AS N FROM p$k),
        g$k AS MATERIALIZED (SELECT p.item,
            CASE WHEN t.T > 0
              THEN CAST((p.gp * t.N * 1000000) // t.T AS BIGINT)
              ELSE 0 END AS g
          FROM p$k p, t$k t)"""
    }
    sb.toString
  }

  private def btFinalSql(rounds: Int): String =
    s"""SELECT i.item AS item_id, g.g AS rating_micro,
          CAST(coalesce(w.wins, 0) AS BIGINT) AS wins, i.comps AS comparisons
        FROM items i
        JOIN g$rounds g ON g.item = i.item
        LEFT JOIN wins w ON w.item = i.item"""

  private val q184OracleSql: String =
    s"""WITH comps AS (
          SELECT a.l_partkey AS w, b.l_partkey AS l
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_quantity > b.l_quantity
           AND a.l_partkey <> b.l_partkey),
        ${btRoundsSql(6)}
        ${btFinalSql(6)}"""

  /** The UniMax water-filling closed form as CTEs over the documents
    * languages, ending at `alloc(source, total_tokens, allocated_tokens,
    * capped)` — shared by the standalone gate (q185) and the budgeted
    * draw composition (q189) so "what UniMax allocates" is defined once.
    * Budget = corpus tokens · num // den. */
  private def unimaxCtesSql(num: Int, den: Int, maxEpochs: Int): String =
    s"""src AS (
          SELECT lang AS source,
            CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
              AS total_tokens
          FROM documents GROUP BY 1),
        b AS (SELECT (CAST(sum(total_tokens) AS BIGINT) * $num) // $den AS budget FROM src),
        r AS (SELECT s.source, s.total_tokens, s.total_tokens * $maxEpochs AS cap,
            row_number() OVER (ORDER BY s.total_tokens, s.source) AS i,
            (SELECT count(*) FROM src) AS k,
            coalesce(sum(s.total_tokens * $maxEpochs) OVER (
              ORDER BY s.total_tokens, s.source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS capsum
          FROM src s),
        c AS (SELECT r.*,
            (cap * (k - i + 1) <= (SELECT budget FROM b) - capsum) AS capped
          FROM r),
        cut AS (SELECT
            CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS t,
            CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0) AS BIGINT) AS cumcap,
            max(k) AS kk
          FROM c),
        alloc AS (SELECT c.source, c.total_tokens,
            CASE WHEN c.capped THEN c.cap
                 WHEN cut.kk > cut.t
                   THEN ((SELECT budget FROM b) - cut.cumcap) // (cut.kk - cut.t)
                 ELSE 0 END AS allocated_tokens,
            CAST(c.capped AS INT) AS capped
          FROM c, cut)"""

  private val q185OracleSql: String =
    s"""WITH ${unimaxCtesSql(5, 2, 3)}
        SELECT source, total_tokens, allocated_tokens, capped,
          CASE WHEN total_tokens > 0
            THEN (1000000 * allocated_tokens) // total_tokens
            ELSE 0 END AS epochs_micro
        FROM alloc"""

  /** q189 oracle: the UniMax alloc CTEs (1-epoch cap, 75% budget) drive
    * the q99 md5-ordered budget-draw replay — keep rule
    * `cum_before < allocated_tokens` under the per-language hash total
    * order. */
  private val q189OracleSql: String =
    s"""WITH ${unimaxCtesSql(3, 4, 1)},
        t AS (SELECT lang, doc_id,
            CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        cw AS (SELECT lang, doc_id, n_tokens,
            COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang
              ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                       doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
              AS cum_before
          FROM t)
        SELECT cw.lang, cw.doc_id, cw.n_tokens, cw.cum_before
        FROM cw JOIN alloc a ON a.source = cw.lang
        WHERE a.allocated_tokens > 0 AND cw.cum_before < a.allocated_tokens"""

  private val q187OracleSql: String =
    s"""WITH pref AS (${WebQueries.oracles("q178_preference_pairs")}),
        comps AS (SELECT chosen_id AS w, rejected_id AS l FROM pref),
        ${btRoundsSql(4)}
        ${btFinalSql(4)}"""

  /** q190 oracle: the same fixed-order product chain per k — each term
    * `CAST(n−c−i AS DOUBLE) / CAST(n−i AS DOUBLE)`, left-to-right, then
    * `round(1e6·(1 − Π))` — IEEE-identical to the engine's expression. */
  private val q190OracleSql: String = {
    def chain(k: Int) = (0 until k)
      .map(i => s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))")
      .mkString(" * ")
    s"""WITH a AS (
          SELECT user_id AS problem_id, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c
          FROM events GROUP BY 1)
        SELECT problem_id, n, c,
          CAST(round(1000000.0 * (1.0 - ${chain(1)})) AS BIGINT) AS pass1_micro,
          CAST(round(1000000.0 * (1.0 - ${chain(10)})) AS BIGINT) AS pass10_micro
        FROM a WHERE n >= 10"""
  }

  /** q191 oracle: the q184 BT chain (shared fragments), the win-rate
    * projection, strict-total-order row_number ranks, then the exact
    * Spearman rational — HUGEINT products, `//` floors negatives like
    * the engine's pmod idiom. */
  private val q191OracleSql: String =
    s"""WITH comps AS (
          SELECT a.l_partkey AS w, b.l_partkey AS l
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_quantity > b.l_quantity
           AND a.l_partkey <> b.l_partkey),
        ${btRoundsSql(6)},
        lb AS (SELECT i.item AS item_id, g.g AS rating,
            (1000000 * coalesce(w.wins, 0)) // i.comps AS wr
          FROM items i
          JOIN g6 g ON g.item = i.item
          LEFT JOIN wins w ON w.item = i.item),
        rk AS (SELECT item_id,
            CAST(row_number() OVER (ORDER BY rating, item_id) AS BIGINT) AS ra,
            CAST(row_number() OVER (ORDER BY wr, item_id) AS BIGINT) AS rb
          FROM lb),
        st AS (SELECT CAST(count(*) AS HUGEINT) AS n,
            CAST(sum(CAST(ra - rb AS HUGEINT) * CAST(ra - rb AS HUGEINT)) AS HUGEINT) AS sd2
          FROM rk)
        SELECT CAST(n AS BIGINT) AS n,
          CASE WHEN n >= 2
            THEN CAST((1000000 * (n * (n * n - 1) - 6 * sd2)) // (n * (n * n - 1)) AS BIGINT)
            ELSE 0 END AS rho_micro
        FROM st"""

  /** q204 oracle: the same duel construction bucketed, the same
    * majority-edge rule, and the triangle enumerated DIRECTLY by the
    * id-order three-way join (the oracle may be quadratic where the
    * engine is degree-oriented — same rows either way); the cycle
    * predicate on canonical flags is `f_ab ≠ f_ac ∧ f_bc = f_ab`. */
  private val q204OracleSql: String =
    """WITH duels AS (
        SELECT a.l_partkey % 100 AS w, b.l_partkey % 100 AS l
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_quantity > b.l_quantity AND a.l_partkey <> b.l_partkey),
      p AS (SELECT least(w, l) AS lo, greatest(w, l) AS hi,
          CAST(sum(CASE WHEN w < l THEN 1 ELSE 0 END) AS BIGINT) AS wl,
          CAST(sum(CASE WHEN w > l THEN 1 ELSE 0 END) AS BIGINT) AS wh
        FROM duels WHERE w <> l GROUP BY 1, 2),
      e AS (SELECT lo, hi, wl > wh AS f FROM p WHERE wl <> wh)
      SELECT e1.lo AS item_a, e1.hi AS item_b, e2.hi AS item_c,
        e1.f AS a_beats_b, e2.f AS b_beats_c, e3.f AS a_beats_c
      FROM e e1
      JOIN e e2 ON e2.lo = e1.hi
      JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
      WHERE e1.f <> e3.f AND e2.f = e1.f"""

  /** q207 oracle: the identical √-weight Hamilton replay — `sqrt` is
    * IEEE-correctly-rounded in both engines, so `floor(sqrt(·))` is the
    * shared integer weight; HUGEINT budget·weight products mirror the
    * engine's decimal(38,0). */
  private val q207OracleSql: String =
    """WITH src AS (SELECT lang AS source,
          CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
            AS total_tokens
        FROM documents GROUP BY 1),
      b AS (SELECT CAST(sum(total_tokens) AS BIGINT) // 2 AS budget FROM src),
      w AS (SELECT source, total_tokens,
          CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS weight
        FROM src),
      t AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM w),
      q AS (SELECT w.*, t.tw,
          CASE WHEN t.tw > 0
            THEN CAST((CAST((SELECT budget FROM b) AS HUGEINT) * weight) // t.tw
                 AS BIGINT) ELSE 0 END AS q,
          CASE WHEN t.tw > 0
            THEN (CAST((SELECT budget FROM b) AS HUGEINT) * weight) % t.tw
            ELSE CAST(0 AS HUGEINT) END AS r
        FROM w, t),
      lft AS (SELECT CAST((SELECT budget FROM b) - sum(q) AS BIGINT) AS leftv,
          CAST(sum(weight) AS BIGINT) AS w2 FROM q),
      g AS (SELECT q.*, CAST(row_number() OVER (ORDER BY r DESC, source)
          AS BIGINT) AS i FROM q)
      SELECT g.source, g.total_tokens, g.weight,
        CASE WHEN lft.w2 > 0
          THEN g.q + CASE WHEN g.i <= lft.leftv THEN 1 ELSE 0 END
          ELSE 0 END AS draw_tokens,
        CASE WHEN g.total_tokens > 0
          THEN CAST((1000000 * CAST(CASE WHEN lft.w2 > 0
              THEN g.q + CASE WHEN g.i <= lft.leftv THEN 1 ELSE 0 END
              ELSE 0 END AS HUGEINT)) // g.total_tokens AS BIGINT)
          ELSE 0 END AS epochs_micro
      FROM g, lft"""

  val oracles: Map[String, String] = Map(
    "q184_bradley_terry" -> q184OracleSql,
    "q204_preference_cycles" -> q204OracleSql,
    "q207_temperature_mix" -> q207OracleSql,
    "q185_unimax" -> q185OracleSql,
    "q187_preference_leaderboard" -> q187OracleSql,
    "q189_unimax_draw" -> q189OracleSql,
    "q190_pass_at_k" -> q190OracleSql,
    "q191_leaderboard_agreement" -> q191OracleSql)
}
