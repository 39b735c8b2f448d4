package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Document-shaping operators for training-data preparation: token-window
  * chunking (context-length packing input) and PII redaction (curation
  * compliance stage). Both are pure Catalyst projections — per-row,
  * no shuffle, fully codegen — and both are exactly replayable in SQL,
  * so the gate hash-checks them end to end (q59, q64).
  */
object TextOps {

  /** Split each document into overlapping token windows of `window`
    * tokens, stepping `window - overlap` tokens — the standard chunking
    * step before tokenizer packing (overlap preserves cross-boundary
    * context). Chunk starts are `k·step`; the final chunk may be shorter
    * (never empty); a document with ≤ `window` tokens yields one chunk.
    * Output: one row per (doc, chunk) with the chunk index, token count
    * and re-joined text. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    require(overlap >= 0 && overlap < window, "0 <= overlap < window")
    val step = window - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks)
    // 1 + ceil(max(0, nTok - window) / step) chunks
    val nChunks = (lit(1) + ceil(greatest(nTok - window, lit(0)).cast("double") / step)).cast("int")
    docs
      .select(col(idCol), toks.as("_toks"), nChunks.as("_nc"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_nc") - 1),
          k => slice(col("_toks"), k * step + 1, lit(window)))).as(Seq("chunk_idx", "_chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("_chunk")).as("n_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }

  /** Sequential pack assignment: walking rows in `idCol` order, each row's
    * pack is `floor(cumulative-weight-before-it / budget)` — the
    * deterministic contiguous-greedy packing used to group documents into
    * fixed token budgets for training batches (order-stable: same data →
    * same packs, no rand(), replayable as a SQL window cumsum).
    *
    * The cumulative sum is a DISTRIBUTED two-phase prefix sum, NOT a
    * global-order window (which Spark executes as a single partition — the
    * classic scale killer for exactly this query): range-partition by id,
    * cumsum per partition in parallel windows, then shift each partition
    * by the total of all partitions before it. The per-partition totals
    * are a #partitions-row collect (a model fetch, like the IVF
    * centroids); everything row-scale stays distributed.
    *
    * The partitioned frame is consumed by TWO jobs (totals collect, then
    * the output), and `repartitionByRange` SAMPLES its boundaries per
    * execution — re-evaluating it could place boundary-adjacent rows in a
    * different partition than the one behind the collected offsets (wrong
    * pack_ids; a partition empty in one job but not the other would lose
    * rows to the offset join). So the frame is pinned: persisted
    * MEMORY_AND_DISK (recompute-on-evict is exactly the failure mode, so
    * spill — not the MEMORY_ONLY recompute level used elsewhere), the
    * output eagerly materialized OFF that cache via localCheckpoint, then
    * released — both jobs provably see one sampled partitioning, and the
    * operator leaves nothing cached behind (on a cluster, checkpoint to
    * reliable storage instead). */
  def sequentialPack(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget >= 1")
    val spark = df.sparkSession
    val w = df.select(col(idCol), col(weightCol).cast("long").as("_w"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pidTotals = w.groupBy("_pid").agg(sum("_w").as("_psum"))
        .orderBy("_pid").collect().map(r => (r.getInt(0), r.getLong(1)))
      // offset of partition k = total weight of partitions before it
      val offsets = pidTotals.map(_._1).zip(
        pidTotals.map(_._2).scanLeft(0L)(_ + _).init)
      val offDf = broadcast(spark.createDataFrame(offsets.toSeq).toDF("_pid", "_off"))
      val cumIn = sum(col("_w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_pid").orderBy(idCol)) - col("_w")
      // exact integer floor-division for ANY budget: subtract the remainder
      // first, so the double division is of an exact multiple (Spark's `/`
      // on longs is double division)
      val cumBefore = col("_off") + cumIn
      w.join(offDf, Seq("_pid"))
        .withColumn("pack_id",
          ((cumBefore - pmod(cumBefore, lit(budget))) / lit(budget)).cast("long"))
        .select(col(idCol), col("_w").as("weight"), col("pack_id"))
        .localCheckpoint() // eager: materialized before w is released below
    } finally w.unpersist(false)
  }

  // Conservative syntax shared by Java regex and RE2 (no lookaround, no
  // backrefs) so the SQL oracle replays the exact same matches.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

  /** Redact emails and phone numbers from a text column, counting each —
    * the PII-scrub stage of a curation pipeline. Emails are replaced
    * first (their local parts may contain digits/dashes that would
    * otherwise partially match the phone pattern), then phones — and
    * `n_phones` is counted on the email-redacted text so the counts
    * reconcile exactly with the `[EMAIL]`/`[PHONE]` tokens in
    * `clean_text` (counting phones on the raw text would report phantom
    * redactions for digit runs inside email local parts). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), col(textCol).as("_raw"),
        regexp_replace(col(textCol), EmailRe, "[EMAIL]").as("_deEmailed"))
      .select(
        col(idCol),
        regexp_count(col("_raw"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("_deEmailed"), lit(PhoneRe)).as("n_phones"),
        regexp_replace(col("_deEmailed"), PhoneRe, "[PHONE]").as("clean_text"))
}
