package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Hybrid retrieval: fuse a lexical (BM25) ranking and a semantic
  * (embedding-cosine) ranking of the same corpus with reciprocal-rank
  * fusion — the standard RAG-era retrieval stack (sparse + dense +
  * RRF), expressed entirely from engine operators.
  *
  * RRF (Cormack et al., SIGIR 2009): each ranking contributes
  * `1/(rrfK + rank)` for every document it ranks; fused order is by the
  * contribution sum. Contributions are micro-quantized
  * (`round(10⁶/(rrfK+rank))` — integers, order-free sums, the q72
  * convention) and every rank is already deterministic (BM25's
  * integer `score_micro` with id tie-break; cosine rounded to 5 with id
  * tie-break), so the fused ranking is exactly replayable by the
  * DuckDB oracle.
  *
  * Scale shape: both arms end in k-sized frames BEFORE fusion — BM25 is
  * the persisted-prune single-scan machinery ([[TextOps.bm25Search]]),
  * the dense arm one corpus scan + bounded per-query top-k
  * ([[Similarity.bruteForceTopK]]; swap in the IVF/PQ/LSH arms at
  * corpus scale — any `(neighbor_id, rank)` frame fuses identically).
  * The fusion join and final sort touch ≤ 2·kEach rows; the one Window
  * ranks the kEach-row lexical frame, never the corpus. */
object Hybrid {

  /** Query-by-example hybrid search: lexical query `queryTerms` over
    * `docs(textCol)`, semantic query = the embedding of `queryVecId` in
    * `emb(vecCol)` (scored against every OTHER embedding, the q50
    * convention). Returns top-`k` of the fused ranking:
    * `(id, rank_lex, rank_sem, rrf_micro)` — a rank column is NULL when
    * that arm did not retrieve the document within its top-`kEach`. */
  def hybridSearch(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String],
      emb: DataFrame, embIdCol: String, vecCol: String, queryVecId: Long,
      k: Int, kEach: Int, rrfK: Int = 60): DataFrame = {
    require(k >= 1 && kEach >= 1 && rrfK >= 1, "k, kEach, rrfK >= 1")
    val lex = TextOps.bm25Search(docs, idCol, textCol, queryTerms, kEach)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("score_micro").desc, col(idCol))))
      .select(col(idCol).as("_lid"), col("rank_lex"))
    val sem = Similarity.bruteForceTopK(
        emb, emb.filter(col(embIdCol) === queryVecId), embIdCol, vecCol, kEach)
      .select(col("neighbor_id").as("_sid"), col("rank").as("rank_sem"))
    def contrib(rank: Column): Column =
      when(rank.isNotNull,
        round(lit(1e6) / (lit(rrfK).cast("double") + rank.cast("double"))).cast("long"))
        .otherwise(lit(0L))
    lex.join(sem, col("_lid") === col("_sid"), "full_outer")
      .select(coalesce(col("_lid"), col("_sid")).as(idCol),
        col("rank_lex"), col("rank_sem"))
      .withColumn("rrf_micro", contrib(col("rank_lex")) + contrib(col("rank_sem")))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
  }
}
