package graft.queries

import graft.Tables
import graft.operators.{Graph, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph-analytics query pack: centrality and label spread over the k=3
  * cosine kNN graph of the `embeddings` table.
  *
  * Since round 11 the gates ride the PRODUCTION edge build —
  * [[Similarity.ivfKnnGraph]] (q221's sub-quadratic IVF partition +
  * probe-cell candidates + exact re-rank) — instead of the exhaustive
  * O(N²) [[Similarity.knnGraph]], which stays gated as the q108 audit
  * arm. This is the ANN family's production/audit convention applied to
  * the graph family (the r10 verdict's #1): the loops are IDENTICAL
  * code over either edge set, the edge build each loop inherits is the
  * one a 100-TB pipeline can actually afford, and the oracles replay
  * the IVF edge set bit-for-bit via [[AnnQueries.ivfKnn3Cte]] — so the
  * gates stay full hash gates, not rows-only approximations.
  *
  * All gates remain exact: integer micro-unit PageRank and
  * deterministically tie-broken label propagation replay move-for-move
  * in DuckDB as unrolled fixed-round CTE chains over the same edges.
  */
object GraphQueries {

  private def knnEdges(s: SparkSession, d: String): DataFrame =
    Similarity.ivfKnnGraph(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)

  // Centrality scoring over the kNN graph — the "how prototypical is this
  // document" prior a curation pipeline uses to pick cluster
  // representatives. 12 fixed rounds, damping 0.85, integer micro-units.
  def q132PageRank(s: SparkSession, d: String): DataFrame =
    Graph.pageRank(knnEdges(s, d).select("query_id", "neighbor_id"),
      "query_id", "neighbor_id", iterations = 12)

  // Semi-supervised label spread: every 10th embedding keeps its true
  // label as a frozen seed; 8 synchronous plurality-vote rounds push
  // labels across the kNN edges. The gate checks every node's final
  // label AND the seed flag.
  def q133LabelProp(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Graph.labelPropagation(knnEdges(s, d), "query_id", "neighbor_id",
      emb.filter(pmod(col("vec_id"), lit(10)) === 0), "vec_id", "label",
      rounds = 8)
  }

  // Graph-density audit: triangles + local clustering coefficient per
  // node of the kNN graph (degree-ordered orientation — each triangle
  // listed once from its lowest-degree corner).
  def q146Triangles(s: SparkSession, d: String): DataFrame =
    Graph.triangleStats(knnEdges(s, d).select("query_id", "neighbor_id"),
      "query_id", "neighbor_id")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_pagerank" -> q132PageRank,
    "q133_label_prop" -> q133LabelProp,
    "q146_triangles" -> q146Triangles)

  /** The integer PageRank recurrence unrolled as a CTE chain ending at
    * `r12(id, r)` — shared by the q132 gate and the curation-v6
    * composition (q135) so "what PageRank computes" is defined once.
    * Assumes a kNN fragment ending at `knn` ([[AnnQueries.ivfKnn3Cte]])
    * precedes it.
    * `//` is DuckDB integral division = Spark's `div` on the
    * non-negative values used here. */
  private[queries] val pageRankChainCtes: String = {
    val iters = 12
    val sb = new StringBuilder
    sb ++= "deg AS (SELECT query_id AS s, count(*) AS deg FROM knn GROUP BY 1),\n"
    sb ++= "nodes AS (SELECT DISTINCT id FROM (SELECT query_id AS id FROM knn UNION ALL SELECT neighbor_id FROM knn)),\n"
    sb ++= "r0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes)"
    for (i <- 1 to iters) {
      sb ++= s""",
        r$i AS MATERIALIZED (
          SELECT n.id,
            CAST(150000 + (85 * coalesce(sums.S, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT k.neighbor_id AS id, CAST(sum(p.r // d.deg) AS BIGINT) AS S
            FROM knn k
            JOIN deg d ON k.query_id = d.s
            JOIN r${i - 1} p ON p.id = k.query_id
            GROUP BY k.neighbor_id) sums ON n.id = sums.id)"""
    }
    sb.toString
  }

  private val q132OracleSql: String =
    s"""WITH ${AnnQueries.ivfKnn3Cte},
        $pageRankChainCtes
        SELECT id AS node_id, r AS rank_micro FROM r12"""

  /** q133 oracle: the plurality-vote rounds unrolled; tie-break
    * (count DESC, label ASC) mirrors the engine's max_by over
    * (count, −label). */
  private val q133OracleSql: String = {
    val rounds = 8
    val sb = new StringBuilder
    sb ++= s"WITH ${AnnQueries.ivfKnn3Cte},\n"
    sb ++= "nodes AS (SELECT DISTINCT id FROM (SELECT query_id AS id FROM knn UNION ALL SELECT neighbor_id FROM knn)),\n"
    sb ++= "seeds AS (SELECT vec_id AS id, CAST(label AS INT) AS seed FROM embeddings WHERE vec_id % 10 = 0),\n"
    sb ++= "ns AS MATERIALIZED (SELECT n.id, s.seed FROM nodes n LEFT JOIN seeds s ON n.id = s.id),\n"
    sb ++= "l0 AS MATERIALIZED (SELECT id, seed, seed AS lbl FROM ns)"
    for (i <- 1 to rounds) {
      sb ++= s""",
        l$i AS MATERIALIZED (
          SELECT ns.id, ns.seed, coalesce(ns.seed, v.vote, p.lbl) AS lbl
          FROM ns
          LEFT JOIN (
            SELECT s, vote FROM (
              SELECT k.query_id AS s, l.lbl AS vote, count(*) AS c
              FROM knn k JOIN l${i - 1} l ON k.neighbor_id = l.id
              WHERE l.lbl IS NOT NULL
              GROUP BY 1, 2)
            QUALIFY row_number() OVER (PARTITION BY s ORDER BY c DESC, vote ASC) = 1
          ) v ON ns.id = v.s
          LEFT JOIN l${i - 1} p ON ns.id = p.id)"""
    }
    sb ++= s"""
      SELECT id AS node_id, lbl AS label,
        CAST(seed IS NOT NULL AS INT) AS is_seed
      FROM l$rounds"""
    sb.toString
  }

  /** q146 oracle: the same degree-ordered orientation replayed with row
    * comparisons; `%` operands are non-negative so DuckDB's remainder
    * equals Spark's pmod. */
  private val q146OracleSql: String =
    s"""WITH ${AnnQueries.ivfKnn3Cte},
        und AS (SELECT DISTINCT least(query_id, neighbor_id) AS a,
                  greatest(query_id, neighbor_id) AS b
                FROM knn WHERE query_id <> neighbor_id),
        deg AS (SELECT n, count(*) AS degree FROM (
                  SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        o AS MATERIALIZED (SELECT
              CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN u.a ELSE u.b END AS u,
              CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN u.b ELSE u.a END AS v,
              CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN db.degree ELSE da.degree END AS dv
            FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
        tri AS (SELECT w1.u, w1.v AS x, w2.v AS y
                FROM o w1 JOIN o w2 ON w1.u = w2.u AND (w1.dv, w1.v) < (w2.dv, w2.v)
                WHERE EXISTS (SELECT 1 FROM o c WHERE c.u = w1.v AND c.v = w2.v)),
        pn AS (SELECT n, count(*) AS triangles FROM (
                 SELECT u AS n FROM tri UNION ALL SELECT x FROM tri
                 UNION ALL SELECT y FROM tri) GROUP BY 1)
        SELECT d.n AS node_id, d.degree,
          CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
          CASE WHEN d.degree < 2 THEN 0
               ELSE CAST((2000000*coalesce(pn.triangles, 0) -
                 ((2000000*coalesce(pn.triangles, 0)) % (d.degree*(d.degree-1)))) /
                 (d.degree*(d.degree-1)) AS BIGINT) END AS cc_micro
        FROM deg d LEFT JOIN pn ON d.n = pn.n"""

  val oracles: Map[String, String] = Map(
    "q132_pagerank" -> q132OracleSql,
    "q133_label_prop" -> q133OracleSql,
    "q146_triangles" -> q146OracleSql)
}
