package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / chat-format operators: turn tables of (conversation, turn order,
  * role, content) rows into training texts with role tags, plus the
  * loss-mask character spans a trainer needs to compute loss only on the
  * target role's tokens — the formatting stage of every instruction-tuning
  * pipeline, as data transformations.
  *
  * Rendering contract (shared verbatim with the SQL oracle): each turn
  * renders as `<|role|>content\n`; a conversation is its turns
  * concatenated in `orderCol` order (which must be unique per
  * conversation — a real pipeline's event/turn id). Offsets are CHARACTER
  * offsets into the final text, [start, end) over the turn's CONTENT
  * (tag and trailing newline excluded).
  *
  * Scale: one shuffle on the conversation key. chatFormat aggregates with
  * an order-preserving `array_sort(collect_list(struct(ord, piece)))` —
  * conversation-bounded state, the groupBy analog of SQL
  * `string_agg(... ORDER BY)`; spans are a window prefix-sum over slim
  * (conv, ord, lengths) rows.
  */
object SftFormat {

  private def turns(df: DataFrame, convCol: String, orderCol: String,
      roleCol: String, contentCol: String): DataFrame =
    df.select(col(convCol).cast("long").as("conv_id"),
        col(orderCol).cast("long").as("ord"),
        col(roleCol).cast("string").as("role"),
        coalesce(col(contentCol).cast("string"), lit("")).as("content"))
      .withColumn("piece",
        concat(lit("<|"), col("role"), lit("|>"), col("content"), lit("\n")))

  /** One training text per conversation: (conv_id, chat_text, n_turns). */
  def chatFormat(df: DataFrame, convCol: String, orderCol: String,
      roleCol: String, contentCol: String): DataFrame =
    turns(df, convCol, orderCol, roleCol, contentCol)
      .groupBy(col("conv_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(ord, piece))), x -> x.piece), '')").as("chat_text"),
        count(lit(1)).as("n_turns"))

  /** Conversation QA for SFT corpora: per-conversation structural audit of
    * the invariants instruction-tuning trainers assume — the gate that runs
    * BEFORE [[chatFormat]] so malformed conversations never reach the
    * formatter. Checks, each an exact integer count:
    *
    *   - `bad_first`      1 if the first turn's role != `firstRole`
    *   - `n_role_repeats` consecutive same-role turns (broken alternation)
    *   - `n_unknown_role` turns whose role is outside `allowedRoles`
    *   - `n_empty`        turns with NULL/whitespace-only content
    *   - `n_dup_ord`      duplicate `orderCol` values (ambiguous ordering)
    *   - `valid`          1 iff every count above is 0
    *
    * Turn order is (ord, role, content) — the role/content tiebreak makes
    * the first-turn and alternation checks deterministic even when `ord`
    * itself is duplicated (exactly the rows `n_dup_ord` flags).
    *
    * Scale: one window + one aggregation over slim rows, both partitioned
    * by the conversation key — a single shuffle, no text concatenation.
    * Output: (conv_id, n_turns, bad_first, n_role_repeats, n_unknown_role,
    * n_empty, n_dup_ord, valid).
    */
  def validateConversations(df: DataFrame, convCol: String, orderCol: String,
      roleCol: String, contentCol: String, firstRole: String,
      allowedRoles: Seq[String]): DataFrame = {
    require(allowedRoles.nonEmpty, "allowedRoles must not be empty")
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("ord"), col("role"), col("content"))
    val one = lit(1L)
    val zero = lit(0L)
    turns(df, convCol, orderCol, roleCol, contentCol)
      .select(col("conv_id"), col("ord"), col("role"), col("content"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_ord", lag(col("ord"), 1).over(w))
      .groupBy(col("conv_id"))
      .agg(
        count(one).as("n_turns"),
        max(when(col("rn") === 1 && col("role") =!= firstRole, one)
          .otherwise(zero)).as("bad_first"),
        sum(when(col("role") === col("prev_role"), one).otherwise(zero))
          .as("n_role_repeats"),
        sum(when(col("role").isInCollection(allowedRoles), zero).otherwise(one))
          .as("n_unknown_role"),
        sum(when(trim(col("content")) === "", one).otherwise(zero))
          .as("n_empty"),
        sum(when(col("ord") === col("prev_ord"), one).otherwise(zero))
          .as("n_dup_ord"))
      .withColumn("valid",
        when(col("bad_first") + col("n_role_repeats") + col("n_unknown_role") +
          col("n_empty") + col("n_dup_ord") === 0, lit(1L)).otherwise(lit(0L)))
  }

  /** Loss-mask spans: for every `targetRole` turn, the [start, end)
    * character span of its CONTENT inside the [[chatFormat]] text.
    * Output: (conv_id, span_idx 0.., span_start, span_end), span_idx
    * counted over target turns in conversation order.
    */
  def lossMaskSpans(df: DataFrame, convCol: String, orderCol: String,
      roleCol: String, contentCol: String, targetRole: String): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns(df, convCol, orderCol, roleCol, contentCol)
      .withColumn("plen", length(col("piece")).cast("long"))
      .withColumn("end_off", sum(col("plen")).over(w))
      .filter(col("role") === targetRole)
      .withColumn("span_idx",
        (row_number().over(Window.partitionBy(col("conv_id"))
          .orderBy(col("ord"))) - 1).cast("long"))
      .select(col("conv_id"), col("span_idx"),
        (col("end_off") - col("plen") +
          length(concat(lit("<|"), col("role"), lit("|>"))).cast("long"))
          .as("span_start"),
        (col("end_off") - 1).as("span_end"))
  }
}
