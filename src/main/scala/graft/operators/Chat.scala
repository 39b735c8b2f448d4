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
    *   - `v_nonempty`: no empty/whitespace-only content
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
            t.getField("c"), lit("<|end|>"))), "").as("rendered"),
        min(col(roleCol).isin(roles.map(_.asInstanceOf[Any]): _*).cast("int"))
          .as("v_roles"),
        min_by(col(roleCol), col(ordCol)).isin("system", "user").cast("int")
          .as("v_starts"),
        (coalesce(max(col("_dup")), lit(0)) === 0).cast("int").as("v_alternates"),
        (max_by(col(roleCol), col(ordCol)) === "assistant").cast("int")
          .as("v_ends"),
        min((trim(col(contentCol)) =!= "").cast("int")).as("v_nonempty"))
      .withColumn("valid",
        (col("v_roles") === 1 && col("v_starts") === 1 &&
          col("v_alternates") === 1 && col("v_ends") === 1 &&
          col("v_nonempty") === 1).cast("int"))
  }
}
