package graft.operators

import graft.SparkSpec

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def render(turns: Seq[(Long, Long, String, String)]) =
    Chat.renderConversations(
      turns.toDF("conv", "ord", "role", "content"), "conv", "ord", "role", "content")
      .collect().map(r => r.getAs[Long]("conv") -> r).toMap

  test("renderConversations: template order follows ordCol, not input order") {
    val out = render(Seq(
      (1L, 2L, "assistant", "fine"), (1L, 1L, "user", "hi")))
    assert(out(1L).getAs[String]("rendered") ==
      "<|user|>hi<|end|><|assistant|>fine<|end|>")
    assert(out(1L).getAs[Long]("n_turns") == 2L)
    assert(out(1L).getAs[Int]("valid") == 1)
  }

  test("renderConversations: every violation class flags, and only its flag") {
    val out = render(Seq(
      // conv 2: duplicate consecutive role
      (2L, 1L, "user", "a"), (2L, 2L, "user", "b"), (2L, 3L, "assistant", "c"),
      // conv 3: assistant-first
      (3L, 1L, "assistant", "a"), (3L, 2L, "user", "b"), (3L, 3L, "assistant", "c"),
      // conv 4: off-whitelist role
      (4L, 1L, "user", "a"), (4L, 2L, "tool", "b"), (4L, 3L, "assistant", "c"),
      // conv 5: user-final
      (5L, 1L, "user", "a"), (5L, 2L, "assistant", "b"), (5L, 3L, "user", "c"),
      // conv 6: whitespace-only content
      (6L, 1L, "user", "  "), (6L, 2L, "assistant", "b")))
    def flags(c: Long) = Seq("v_roles", "v_starts", "v_alternates", "v_ends",
      "v_nonempty").map(f => f -> out(c).getAs[Int](f)).toMap
    assert(flags(2L) == Map("v_roles" -> 1, "v_starts" -> 1,
      "v_alternates" -> 0, "v_ends" -> 1, "v_nonempty" -> 1))
    assert(flags(3L) == Map("v_roles" -> 1, "v_starts" -> 0,
      "v_alternates" -> 1, "v_ends" -> 1, "v_nonempty" -> 1))
    assert(flags(4L) == Map("v_roles" -> 0, "v_starts" -> 1,
      "v_alternates" -> 1, "v_ends" -> 1, "v_nonempty" -> 1))
    assert(flags(5L) == Map("v_roles" -> 1, "v_starts" -> 1,
      "v_alternates" -> 1, "v_ends" -> 0, "v_nonempty" -> 1))
    assert(flags(6L) == Map("v_roles" -> 1, "v_starts" -> 1,
      "v_alternates" -> 1, "v_ends" -> 1, "v_nonempty" -> 0))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(out(_).getAs[Int]("valid") == 0))
  }

  test("renderConversations: system opener is a valid start; single-turn user conv is not valid") {
    val out = render(Seq(
      (7L, 1L, "system", "be brief"), (7L, 2L, "user", "q"),
      (7L, 3L, "assistant", "a"),
      (8L, 1L, "user", "hello?")))
    assert(out(7L).getAs[Int]("valid") == 1)
    assert(out(8L).getAs[Int]("v_ends") == 0 && out(8L).getAs[Int]("valid") == 0)
  }

  test("preferencePairs: extremes, margin filter, deterministic low-id tie-break") {
    val cands = Seq(
      // prompt 1: clear extremes
      (1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L),
      // prompt 2: margin 0 (all tie) -> dropped at minMargin 1
      (2L, 20L, 4L), (2L, 21L, 4L),
      // prompt 3: chosen ties (9,9) -> lowest id 30; rejected ties (1,1) -> lowest id 32
      (3L, 31L, 9L), (3L, 30L, 9L), (3L, 33L, 1L), (3L, 32L, 1L)
    ).toDF("prompt", "cand", "score")
    val out = Chat.preferencePairs(cands, "prompt", "cand", "score")
      .collect().map(r => r.getAs[Long]("prompt") ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin")))).toMap
    assert(out(1L) == ((11L, 12L, 7L)), out)
    assert(!out.contains(2L), "zero-margin prompt must be dropped")
    assert(out(3L) == ((30L, 32L, 8L)), out)
  }

  test("lossMaskSpans: spans cut the rendered string exactly at assistant content") {
    val turns = Seq(
      (1L, 1L, "user", "hi there"), (1L, 2L, "assistant", "hello!"),
      (1L, 3L, "user", "more?"), (1L, 4L, "assistant", "yes"))
      .toDF("conv", "ord", "role", "content")
    val rendered = Chat.renderConversations(turns, "conv", "ord", "role", "content")
      .collect().head.getAs[String]("rendered")
    val spans = Chat.lossMaskSpans(turns, "conv", "ord", "role", "content")
      .collect().map(r => (r.getAs[Long]("ord"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    assert(spans.length == 2)
    for ((ord, s, e) <- spans) {
      val content = rendered.substring(s.toInt, e.toInt)
      assert(content == (if (ord == 2L) "hello!" else "yes"),
        s"span [$s,$e) of '$rendered' gave '$content'")
    }
  }

  test("NULL content is whitespace-like: renders empty, flags v_nonempty=0, valid=0") {
    // one NULL among real turns, and an all-NULL conversation — both must
    // come out valid=0 (never NULL), and the NULL turn must still appear
    // in the rendered string as <|role|><|end|> so offsets stay aligned
    val turns = Seq(
      (10L, 1L, "user", "hi"), (10L, 2L, "assistant", null),
      (11L, 1L, "user", null), (11L, 2L, "assistant", null))
      .toDF("conv", "ord", "role", "content")
    val out = Chat.renderConversations(turns, "conv", "ord", "role", "content")
      .collect().map(r => r.getAs[Long]("conv") -> r).toMap
    assert(out(10L).getAs[String]("rendered") ==
      "<|user|>hi<|end|><|assistant|><|end|>")
    assert(out(10L).getAs[Int]("v_nonempty") == 0)
    assert(out(10L).getAs[Int]("valid") == 0)
    assert(out(11L).getAs[String]("rendered") ==
      "<|user|><|end|><|assistant|><|end|>")
    assert(out(11L).getAs[Int]("v_nonempty") == 0)
    assert(out(11L).getAs[Int]("valid") == 0)
    // lossMaskSpans on the same frame: the NULL-content assistant turn
    // yields an EMPTY span (span_end == span_start), never a NULL, and
    // later spans still index the rendered string correctly
    val spans = Chat.lossMaskSpans(turns, "conv", "ord", "role", "content")
      .collect().map(r => (r.getAs[Long]("conv"), r.getAs[Long]("ord")) ->
        ((r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))).toMap
    val (s10, e10) = spans((10L, 2L))
    assert(s10 == e10, "NULL content must give an empty span, not NULL")
    assert(out(10L).getAs[String]("rendered").length.toLong >= e10)
    val (s11a, e11a) = spans((11L, 2L))
    assert(s11a == e11a)
    assert(s11a == "<|user|><|end|><|assistant|>".length.toLong)
  }

  test("renderConversations: conv 3 alternation note — assistant-first still alternates") {
    val out = render(Seq(
      (9L, 1L, "assistant", "a"), (9L, 2L, "user", "b"), (9L, 3L, "assistant", "c")))
    assert(out(9L).getAs[Int]("v_alternates") == 1)
    assert(out(9L).getAs[Int]("v_starts") == 0)
  }
}
