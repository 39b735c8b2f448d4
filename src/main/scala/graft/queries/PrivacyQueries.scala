package graft.queries

import graft.Tables
import graft.operators.Privacy
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Privacy-audit query pack — the release-gate diagnostics over the
  * q130 quasi-identifier universe (segment × nation bucket, sensitive =
  * account-balance band):
  *
  *   - q198: l-diversity audit — distinct-l and recursive (c,l) verdicts
  *     per equivalence class (parameters l=4, c=1 chosen so both verdict
  *     classes appear at every gate SF).
  *   - q199: t-closeness audit — ordered-EMD distance of each class's
  *     balance-band distribution from the population's, exact micro-units.
  */
object PrivacyQueries {

  /** The shared quasi-identified view: the q130 columns, sensitive =
    * balance band. */
  private def custView(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_mktsegment"),
      pmod(col("c_nationkey"), lit(5)).as("nat_mod"),
      floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))

  def q198LDiversity(s: SparkSession, d: String): DataFrame =
    Privacy.lDiversityAudit(custView(s, d),
      Seq("c_mktsegment", "nat_mod"), "bal_band", l = 4, c = 1)

  def q199TCloseness(s: SparkSession, d: String): DataFrame =
    Privacy.tCloseness(custView(s, d),
      Seq("c_mktsegment", "nat_mod"), "bal_band")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_l_diversity" -> q198LDiversity,
    "q199_t_closeness" -> q199TCloseness)

  /** The quasi-identified grain both oracles start from — MUST mirror
    * [[custView]] exactly (same floor, same pmod). */
  private val grainSql: String =
    """b AS (SELECT c_mktsegment AS s, c_nationkey % 5 AS nm,
          CAST(floor(c_acctbal / 2000) AS BIGINT) AS v,
          CAST(count(*) AS BIGINT) AS cnt
        FROM customer GROUP BY 1, 2, 3)"""

  private val q198OracleSql: String =
    s"""WITH $grainSql,
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY s, nm
          ORDER BY cnt DESC, v) AS BIGINT) AS rk FROM b)
      SELECT s AS c_mktsegment, nm AS nat_mod,
        CAST(sum(cnt) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(max(cnt) AS BIGINT) AS top_count,
        CAST(sum(CASE WHEN rk >= 4 THEN cnt ELSE 0 END) AS BIGINT) AS tail_sum,
        count(*) >= 4 AS distinct_l_ok,
        max(cnt) < 1 * sum(CASE WHEN rk >= 4 THEN cnt ELSE 0 END)
          AS recursive_cl_ok
      FROM r GROUP BY 1, 2"""

  private val q199OracleSql: String =
    s"""WITH $grainSql,
      g AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS gc FROM b GROUP BY 1),
      tot AS (SELECT CAST(sum(gc) AS BIGINT) AS nn,
          CAST(count(*) AS BIGINT) AS m FROM g),
      cl AS (SELECT s, nm, CAST(sum(cnt) AS BIGINT) AS nc FROM b GROUP BY 1, 2),
      mx AS (SELECT cl.s, cl.nm, cl.nc, g.v, tot.nn, tot.m,
          CAST(coalesce(b.cnt, 0) AS HUGEINT) * tot.nn
            - CAST(g.gc AS HUGEINT) * cl.nc AS d
        FROM cl CROSS JOIN g CROSS JOIN tot
        LEFT JOIN b ON b.s = cl.s AND b.nm = cl.nm AND b.v = g.v),
      p AS (SELECT s, nm, nc, nn, m,
          sum(d) OVER (PARTITION BY s, nm ORDER BY v) AS pre
        FROM mx)
      SELECT s AS c_mktsegment, nm AS nat_mod, max(nc) AS n,
        CASE WHEN max(m) > 1
          THEN CAST((1000000 * sum(abs(pre)))
                 // ((max(m) - 1) * CAST(max(nc) AS HUGEINT) * max(nn))
               AS BIGINT)
          ELSE 0 END AS t_micro
      FROM p GROUP BY 1, 2"""

  val oracles: Map[String, String] = Map(
    "q198_l_diversity" -> q198OracleSql,
    "q199_t_closeness" -> q199OracleSql)
}
