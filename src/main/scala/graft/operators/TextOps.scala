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
