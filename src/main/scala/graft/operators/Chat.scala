package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation (SFT/chat) data operators — the instruction-tuning side
  * of the training-data pipeline: turn-structured records rendered into
  * one model-ready training string per conversation, with the
  * structural validation every SFT data loader enforces before
  * tokenization (role whitelist, opening role, strict alternation, the
  * assistant-final convention, non-empty contents).
  *
  * The template is the generic special-token form
  * `<|role|>content<|end|>` — the public chat-markup shape (ChatML-
  * style role sentinels); swap-in of a concrete tokenizer's sentinels
  * is a string-literal choice, not a structural one.
  */
object Chat {

  /** Render keyed conversation turns into one training string per
    * conversation and validate turn structure. Input: one row per turn
    * (`convCol`, integer `ordCol` unique per conversation, `roleCol`,
    * `contentCol`). Output per conversation: `n_turns`, `rendered`
    * (turns in `ordCol` order as `<|role|>content<|end|>`), and 0/1
    * structural flags —
    *
    *   - `v_roles`: every role is in `roles`
    *   - `v_starts`: the first role is `system` or `user`
    *   - `v_alternates`: no two consecutive turns share a role
    *   - `v_ends`: the last role is `assistant`
    *   - `v_nonempty`: no empty/whitespace-only/NULL content (a NULL
    *     content is treated exactly like whitespace-only: the turn
    *     renders as `<|role|><|end|>` and the conversation is flagged
    *     invalid — never silently dropped from the rendered string)
    *   - `valid`: the conjunction
    *
    * Shape: ONE hash Exchange on the conversation key — the lag window
    * (previous role) and the keyed aggregation share the partitioning,
    * so Catalyst plans a single shuffle; the rendered string reassembles
    * via sorted-struct `collect_list` (the q88 idiom — state bounded by
    * each conversation's own turn count, the natural grain a chat
    * record must fit anyway). No corpus-wide sort, no driver data. */
  def renderConversations(turns: DataFrame, convCol: String, ordCol: String,
      roleCol: String, contentCol: String,
      roles: Seq[String] = Seq("system", "user", "assistant")): DataFrame = {
    require(roles.nonEmpty, "at least one allowed role")
    val w = Window.partitionBy(col(convCol)).orderBy(col(ordCol))
    val flagged = turns.select(col(convCol), col(ordCol),
      col(roleCol), col(contentCol),
      (col(roleCol) === lag(col(roleCol), 1).over(w)).cast("int").as("_dup"))
    flagged.groupBy(col(convCol))
      .agg(
        count(lit(1)).cast("long").as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col(ordCol).as("o"),
            col(roleCol).as("r"), col(contentCol).as("c")))),
          t => concat(lit("<|"), t.getField("r"), lit("|>"),
            coalesce(t.getField("c"), lit("")), lit("<|end|>"))), "")
          .as("rendered"),
        min(col(roleCol).isin(roles.map(_.asInstanceOf[Any]): _*).cast("int"))
          .as("v_roles"),
        min_by(col(roleCol), col(ordCol)).isin("system", "user").cast("int")
          .as("v_starts"),
        (coalesce(max(col("_dup")), lit(0)) === 0).cast("int").as("v_alternates"),
        (max_by(col(roleCol), col(ordCol)) === "assistant").cast("int")
          .as("v_ends"),
        min((coalesce(trim(col(contentCol)), lit("")) =!= "").cast("int"))
          .as("v_nonempty"))
      .withColumn("valid",
        (col("v_roles") === 1 && col("v_starts") === 1 &&
          col("v_alternates") === 1 && col("v_ends") === 1 &&
          col("v_nonempty") === 1).cast("int"))
  }

  /** Preference pairs for DPO/RLHF reward data: per prompt, the
    * highest-scored candidate becomes `chosen` and the lowest-scored
    * `rejected`, kept only when the score margin is at least
    * `minMargin` (a too-close pair teaches nothing). Ties are
    * deterministic: equal-score candidates resolve to the LOWEST
    * candidate id on both sides (so a prompt whose candidates all tie
    * yields chosen == rejected and is dropped by any positive margin).
    * Output: `promptCol`, `chosen_id`, `rejected_id`, `chosen_score`,
    * `rejected_score`, `margin`.
    *
    * Shape: ONE keyed aggregation — `max_by`/`min_by` over the
    * (score, tie-break) struct, map-side combinable; never a per-prompt
    * rank window over the candidate table. */
  def preferencePairs(cands: DataFrame, promptCol: String, candCol: String,
      scoreCol: String, minMargin: Long = 1L): DataFrame = {
    require(minMargin >= 0, "minMargin >= 0")
    // tie-break struct: (score asc, id desc) so max picks (top score,
    // lowest id) and min picks (bottom score, lowest id) — both sides
    // prefer the earliest candidate deterministically
    val up = struct(col(scoreCol).cast("long"), (-col(candCol)).cast("long"))
    val dn = struct(col(scoreCol).cast("long"), col(candCol).cast("long"))
    cands.groupBy(col(promptCol))
      .agg(
        max_by(col(candCol), up).as("chosen_id"),
        min_by(col(candCol), dn).as("rejected_id"),
        max(col(scoreCol).cast("long")).as("chosen_score"),
        min(col(scoreCol).cast("long")).as("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("margin") >= minMargin)
  }

  /** Loss-mask spans for SFT training: the 0-based character intervals
    * of [[renderConversations]]'s `rendered` string that cover the
    * CONTENT of every `maskRole` turn — the spans a trainer unmasks for
    * the loss (everything else is prompt/scaffolding). One row per
    * masked turn: `convCol`, `ordCol`, `span_start` (inclusive),
    * `span_end` (exclusive); `substring(rendered, span_start+1,
    * span_end-span_start) == content` by construction (property-tested
    * against the renderer). NULL content is treated as `''` — the same
    * convention as the renderer, so the offsets of every LATER turn stay
    * aligned with `rendered` and the degenerate turn itself yields an
    * empty span (`span_end == span_start`), never a NULL.
    *
    * Shape: one key Exchange — a running-sum window over each
    * conversation's own turns accumulates the rendered-piece lengths;
    * pure integer arithmetic after that. */
  def lossMaskSpans(turns: DataFrame, convCol: String, ordCol: String,
      roleCol: String, contentCol: String,
      maskRole: String = "assistant"): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    // piece = "<|" + role + "|>" + content + "<|end|>"
    val contentLen = coalesce(length(col(contentCol)), lit(0))
    val pieceLen = (length(col(roleCol)) + lit(4) +
      contentLen + lit(7)).cast("long")
    val headLen = (length(col(roleCol)) + lit(4)).cast("long")
    turns.select(col(convCol), col(ordCol), col(roleCol), col(contentCol),
        coalesce(sum(pieceLen).over(w), lit(0L)).as("_before"),
        headLen.as("_head"))
      .filter(col(roleCol) === maskRole)
      .select(col(convCol), col(ordCol),
        (col("_before") + col("_head")).as("span_start"),
        (col("_before") + col("_head") + contentLen)
          .cast("long").as("span_end"))
  }
}
