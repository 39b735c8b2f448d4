package graft.queries

import graft.Tables
import graft.operators.{Graph, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph-analytics query pack: centrality and label spread over the k=3
  * cosine kNN graph of the `embeddings` table (the q108 edge set — both
  * oracles replay it via [[AnnQueries.knnEdges3Cte]], so the three gates
  * can never drift apart on what the graph IS).
  *
  * Both gates are exact: integer micro-unit PageRank and
  * deterministically tie-broken label propagation replay move-for-move
  * in DuckDB as unrolled fixed-round CTE chains.
  */
object GraphQueries {

  private def knnEdges(s: SparkSession, d: String): DataFrame =
    Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_pagerank" -> q132PageRank,
    "q133_label_prop" -> q133LabelProp)

  /** The integer PageRank recurrence unrolled as a CTE chain ending at
    * `r12(id, r)` — shared by the q132 gate and the curation-v6
    * composition (q135) so "what PageRank computes" is defined once.
    * Assumes the kNN fragment ([[AnnQueries.knnEdges3Cte]]) precedes it.
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
    s"""WITH ${AnnQueries.knnEdges3Cte},
        $pageRankChainCtes
        SELECT id AS node_id, r AS rank_micro FROM r12"""

  /** q133 oracle: the plurality-vote rounds unrolled; tie-break
    * (count DESC, label ASC) mirrors the engine's max_by over
    * (count, −label). */
  private val q133OracleSql: String = {
    val rounds = 8
    val sb = new StringBuilder
    sb ++= s"WITH ${AnnQueries.knnEdges3Cte},\n"
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

  val oracles: Map[String, String] = Map(
    "q132_pagerank" -> q132OracleSql,
    "q133_label_prop" -> q133OracleSql)
}
