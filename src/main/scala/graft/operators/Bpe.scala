package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al., ACL 2016) — the "train the tokenizer on the corpus" stage of an
  * LLM data pipeline, distributed the way BPE actually distributes:
  *
  *  - The corpus collapses ONCE to a (word, frequency) table — after that
  *    first keyed aggregation every training round touches only the
  *    vocab-sized word table, never the corpus again. That is the whole
  *    scale story: 100 TB of text becomes tens of millions of distinct
  *    words, and each merge round is one pair-count aggregation plus one
  *    vocab-sized map over it.
  *  - Per round the driver fetches exactly ONE row (the argmax pair) —
  *    the same model/metadata-only collect contract as the IVF centroid
  *    fetch. Merge application is a Scala function over the VOCAB table
  *    (sequential left-to-right semantics inside one word cannot be
  *    expressed with array combinators), which is the one place this
  *    codebase accepts per-row imperative logic: the input is the
  *    aggregated model table, not corpus rows.
  *  - Lineage is truncated per round with `localCheckpoint` (the
  *    connectedComponents discipline) so `numMerges` rounds never stack
  *    `numMerges` UDF projections into one analysis-exploding plan.
  *
  * This implementation is the moderate-vocab regime (hundreds to a few
  * thousand merges — one distributed round per merge). Production
  * tokenizers with 50k+ merges maintain pair counts incrementally
  * instead of recounting; that optimization changes no semantics and is
  * out of scope here — the per-round recount is the honest, exact
  * baseline.
  */
object Bpe {

  /** End-of-word marker, its own symbol (so "low" as a prefix of
    * "lower" and "low" as a full word learn different merges). */
  val EndMark = "</w>"

  /** Merge every non-overlapping adjacent (l, r) occurrence, scanning
    * left to right — "a a a" under merge (a,a) becomes ["aa", "a"]. */
  private[operators] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Greedy BPE encode of one word under a learned rank table: repeatedly
    * merge the lowest-rank adjacent pair until none is mergeable. For any
    * word seen in training (and full merges applied) this reproduces the
    * training end state, because training applied merges in exactly this
    * rank order. */
  private[operators] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.split("").toSeq :+ EndMark
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else syms = applyMerge(syms, bl, br)
    }
    syms
  }

  private val applyMergeUdf =
    udf((syms: Seq[String], l: String, r: String) => applyMerge(syms, l, r))

  /** Train `numMerges` BPE merges on the whitespace-token stream of
    * `textCol`. Returns the ordered merge table
    * `(rank, left, right, pair_count)` — the tokenizer model. Stops
    * early when the best remaining pair occurs fewer than `minPairCount`
    * times (weighted by word frequency). Ties on pair count break
    * lexicographically on (left, right), so training is fully
    * deterministic regardless of partitioning. */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, "numMerges >= 1")
    val spark = docs.sparkSession
    var words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))
      .select(concat(split(col("_w"), ""), array(lit(EndMark))).as("_syms"),
        col("_f"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    // Rounds retire ONE BEHIND: the next round's checkpoint is lazy (it
    // materializes during that round's pair-count job — one distributed
    // job per round, not two), so the replaced round's blocks are the
    // lazily-checkpointed child's only source — lineage is truncated, a
    // dropped block can never be recomputed — and can only be freed
    // AFTER the collect() that materializes the successor. (Freeing
    // needs [[graft.CacheScope.releaseLocalCheckpoint]]: a checkpoint
    // persists at the RDD level, where `Dataset.unpersist` is a no-op.)
    var retired: DataFrame = null
    try {
      var rank = 0
      var exhausted = false
      while (rank < numMerges && !exhausted) {
        val best = words
          .select(col("_f"), explode(zip_with(
            slice(col("_syms"), lit(1), size(col("_syms")) - 1),
            slice(col("_syms"), lit(2), size(col("_syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("_pr"))
          .groupBy(col("_pr.l").as("_l"), col("_pr.r").as("_r"))
          .agg(sum(col("_f")).as("_c"))
          .orderBy(col("_c").desc, col("_l").asc, col("_r").asc)
          .limit(1)
          .collect() // exactly one model row per round, never corpus data
        // that job materialized `words` — the round it replaced is now
        // consumer-free and its checkpoint blocks can go
        if (retired ne null) {
          graft.CacheScope.releaseLocalCheckpoint(retired); retired = null
        }
        if (best.isEmpty || best.head.getLong(2) < minPairCount) exhausted = true
        else {
          val (l, r, c) =
            (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
          merges += ((rank, l, r, c))
          // LAZY checkpoint: the next round's pair-count job materializes
          // it, so each round costs ONE distributed job, not two — the
          // lineage still truncates at every round
          val next = words
            .withColumn("_syms", applyMergeUdf(col("_syms"), lit(l), lit(r)))
            .localCheckpoint(false)
          retired = words
          words = next
          rank += 1
        }
      }
    } finally {
      if (retired ne null) graft.CacheScope.releaseLocalCheckpoint(retired)
      graft.CacheScope.releaseLocalCheckpoint(words)
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Encode every distinct word of `docs` under a trained merge table:
    * `(word, subwords, n_subwords)`. The per-word greedy merge loop runs
    * once per DISTINCT word (vocab-sized work); the merge table collects
    * to a rank map first — it is `numMerges` rows, a model fetch. */
  def bpeEncodeWords(docs: DataFrame, textCol: String,
      merges: DataFrame): DataFrame = {
    val ranks = merges.select("rank", "left", "right").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val enc = udf((w: String) => encodeWord(w, ranks))
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .withColumn("subwords", enc(col("word")))
      .withColumn("n_subwords", size(col("subwords")))
  }

  /** Per-document subword statistics under a trained merge table:
    * `(id, n_words, n_subwords)` — the token-budget accounting that
    * feeds context packing ([[TextOps.sequentialPack]]). Documents join
    * the vocab-sized encoded dictionary on the word key (broadcast when
    * small, plain equi-join otherwise); the greedy encode itself never
    * runs on corpus rows. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val dict = bpeEncodeWords(docs, textCol, merges)
      .select(col("word").as("_dw"), col("n_subwords").as("_ns"))
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("_w"))
      .filter(length(col("_w")) > 0)
      .join(dict, col("_w") === col("_dw"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("_ns")).as("n_subwords"))
  }
}
