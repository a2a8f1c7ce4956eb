package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chat formatting + loss-mask spans: hand-computed offsets, span/text
  * consistency (the span really cuts the target content out of the text),
  * and preference-pair tie/degenerate semantics.
  */
class SftFormatSpec extends SparkSpec {
  import spark.implicits._

  private val convo = Seq(
    (1L, 1L, "user", "hi"),
    (1L, 2L, "assistant", "yo"),
    (1L, 3L, "user", "ok"),
    (2L, 7L, "assistant", "solo")
  ).toDF("conv", "ord", "role", "content")

  test("chatFormat renders role-tagged turns in order") {
    val got = SftFormat.chatFormat(convo, "conv", "ord", "role", "content")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === (("<|user|>hi\n<|assistant|>yo\n<|user|>ok\n", 3L)))
    assert(got(2L) === (("<|assistant|>solo\n", 1L)))
  }

  test("lossMaskSpans carry hand-computed [start, end) content offsets") {
    val got = SftFormat.lossMaskSpans(convo, "conv", "ord", "role", "content",
        "assistant")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // conv 1: "<|user|>hi\n" is 11 chars; "<|assistant|>" is 13 → "yo" at [24, 26)
    assert(got === Set((1L, 0L, 24L, 26L), (2L, 0L, 13L, 17L)))
  }

  test("every span substrings to exactly the target turn's content") {
    val text = SftFormat.chatFormat(convo, "conv", "ord", "role", "content")
    val spans = SftFormat.lossMaskSpans(convo, "conv", "ord", "role",
      "content", "assistant")
    val cut = spans.join(text, "conv_id")
      .select(col("conv_id"), expr(
        "substring(chat_text, CAST(span_start + 1 AS INT), " +
          "CAST(span_end - span_start AS INT))").as("cut"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut === Map(1L -> "yo", 2L -> "solo"))
  }

  test("validateConversations: clean conversation audits to all zeros") {
    val got = SftFormat.validateConversations(convo, "conv", "ord", "role",
        "content", "user", Seq("user", "assistant"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    // conv 1: user/assistant/user — clean
    assert(got(1L) === Seq(3L, 0L, 0L, 0L, 0L, 0L, 1L))
    // conv 2: single assistant turn — bad first role only
    assert(got(2L) === Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("validateConversations counts every failure mode independently") {
    val bad = Seq(
      (1L, 1L, "user", "hi"),
      (1L, 2L, "user", "again"),      // role repeat
      (1L, 3L, "system", "cfg"),      // unknown role
      (1L, 4L, "assistant", "  "),    // whitespace-only content
      (1L, 4L, "assistant", "dup"),   // duplicate ord (also a role repeat)
      (2L, 1L, "user", "ok"),
      (2L, 2L, "assistant", "fine")
    ).toDF("conv", "ord", "role", "content")
    val got = SftFormat.validateConversations(bad, "conv", "ord", "role",
        "content", "user", Seq("user", "assistant"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    // n_turns, bad_first, n_role_repeats, n_unknown_role, n_empty, n_dup_ord, valid
    assert(got(1L) === Seq(5L, 0L, 2L, 1L, 1L, 1L, 0L))
    assert(got(2L) === Seq(2L, 0L, 0L, 0L, 0L, 0L, 1L))
  }

  test("prefPairs: deterministic extremes, degenerate groups emit nothing") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 7L),                     // singleton: no pair
      (6L, "c", 9L), (7L, "c", 9L)       // all-equal: zero-margin, dropped
    ).toDF("doc_id", "src", "score")
    val got = Selection.prefPairs(docs, "src", "doc_id", col("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq === Seq(("a", 2L, 4L, 25L))) // ties: min id 2 beats 3
  }
}
