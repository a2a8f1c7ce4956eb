package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thresholds for [[GopherRules.gate]] — defaults are the published Gopher
  * values (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
  * Insights from Training Gopher", Table A1), with the repeated-n-gram rule
  * represented by its n=5 row.
  */
case class GopherThresholds(
    minWords: Long = 50L,
    maxWords: Long = 100000L,
    minMeanWordLen: Double = 3.0,
    maxMeanWordLen: Double = 10.0,
    maxSymbolWordRatio: Double = 0.1,
    minAlphaWordFrac: Double = 0.8,
    minStopwordsPresent: Long = 2L,
    maxBulletLineFrac: Double = 0.9,
    maxEllipsisLineFrac: Double = 0.3,
    maxDupLineFrac: Double = 0.30,
    maxDupLineCharFrac: Double = 0.20,
    maxTop2gramCharFrac: Double = 0.20,
    maxTop3gramCharFrac: Double = 0.18,
    maxTop4gramCharFrac: Double = 0.16,
    maxDup5gramCharFrac: Double = 0.15)

/** The Gopher document-quality rule set (Rae et al. 2021, Appendix A1.1) —
  * the standard pretraining heuristic filter suite: word-level sanity
  * bounds, within-document line repetition, most-frequent-n-gram mass, and
  * repeated-5-gram character coverage. The reference engine has no
  * document-quality surface; this generalizes its Transformer map/filter
  * step (etl-core/src/transformer.rs:13-36) to the corpus-curation rules a
  * training-data pipeline actually runs.
  *
  * Every signal is an exact integer ratio — counts and character sums are
  * BIGINTs and each emitted fraction is ONE correctly-rounded IEEE division
  * (or an exact integer product cast to double, then one division), so a
  * SQL oracle engine reproduces the values bit-for-bit; no libm calls.
  *
  * Scale notes (100 TB stance): line and n-gram statistics shuffle slim
  * (id, md5/gram, count) rows — never document text beyond the gram
  * itself; all aggregations are partial (map-side combine); the
  * most-frequent-gram rank is a per-(doc, n) row_number that
  * WindowGroupLimit prunes to top-1 per partition before the shuffle; the
  * repeated-5-gram pass reuses the span-coverage shape of
  * [[CorpusStats.removeRepeatedSpans]] (positions as ints, spans as md5).
  * Joins are per-doc aggregate ⋈ per-doc aggregate on the id — AQE picks
  * broadcast when a side is small and degrades to shuffle hash join, never
  * a driver collect.
  */
object GopherRules extends Serializable {

  /** Working / output column names; an idCol that collides would silently
    * join or aggregate wrong (same contract as CorpusStats.Reserved).
    */
  private val Reserved = Set("line", "h", "c", "len", "is_bullet",
    "is_ellipsis", "gram", "n", "p", "tok", "sp", "pos", "tk", "nrm",
    "n_tokens", "mean_word_len", "alpha_word_frac", "symbol_word_ratio",
    "n_stopwords_present", "n_lines", "dup_line_frac", "dup_line_char_frac",
    "bullet_line_frac", "ellipsis_line_frac", "top_2gram_char_frac",
    "top_3gram_char_frac", "top_4gram_char_frac", "dup_5gram_char_frac",
    "gopher_keep", "c2", "g2", "c3", "g3", "c4", "g4", "rn", "cov_chars",
    "tot_chars", "n_dup_line", "dup_chars", "all_chars", "n_bullet",
    "n_ellipsis", "n_distinct_lines", "__len")

  private def guard(idCol: String): Unit =
    require(!Reserved(idCol),
      s"idCol '$idCol' collides with a GopherRules working column")

  /** Gopher's stopword list (presence of ≥2 distinct ones is the
    * "coherent English prose" smell test).
    */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val BulletRe = "^[-*•]"
  private val EllipsisRe = "(\\.\\.\\.|…)$"

  /** All Gopher repetition/quality signals, one row per input document:
    *
    * word-level (map-only): `n_tokens`, `mean_word_len`,
    * `alpha_word_frac` (fraction of tokens containing a letter),
    * `symbol_word_ratio` (`#`/ellipsis occurrences per token),
    * `n_stopwords_present` (distinct [[Stopwords]] appearing);
    *
    * line-level (lines = `\n+`-separated, trimmed, blanks dropped):
    * `n_lines`, `dup_line_frac` (line instances beyond their first
    * occurrence / lines), `dup_line_char_frac` (chars of those repeat
    * instances / all line chars), `bullet_line_frac`, `ellipsis_line_frac`;
    *
    * n-gram level: `top_{2,3,4}gram_char_frac` (most frequent word n-gram's
    * occurrences × its char length / doc char length; ties break to the
    * lexicographically smallest gram; 0 when the doc has < n tokens) and
    * `dup_5gram_char_frac` (chars of tokens covered by a 5-gram occurring
    * ≥2 times in the doc / chars of all tokens).
    */
  def repetitionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    guard(idCol)
    val id = col(idCol)
    val text = col(textCol)
    val toks = TextOps.tokens(text)
    // whitespace-normalized text: stopword occurrence markers are
    // space-delimited, and a newline between words must still delimit
    val nrm = regexp_replace(text, "\\s+", " ")

    // ---- word-level signals: pure Column arithmetic, zero exchanges ----
    val stopHits = Stopwords.map(w =>
      when(TextOps.occurrences(nrm, s" $w ") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val wordLevel = df.select(id,
      // doc char length ONLY — the text itself must not ride the joins
      length(text).cast("long").as("__len"),
      size(toks).cast("long").as("n_tokens"),
      (length(regexp_replace(text, "\\s", "")).cast("double") /
        size(toks)).as("mean_word_len"),
      (size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
        size(toks)).as("alpha_word_frac"),
      ((regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")) +
        regexp_count(text, lit("…"))).cast("double") /
        size(toks)).as("symbol_word_ratio"),
      stopHits.as("n_stopwords_present"))

    // ---- line-level: explode → (id, line-hash) counts → per-doc ratios.
    //      Line TEXT never shuffles past the first partial agg; the
    //      (id, h) key carries count + length + flag bits only. ----
    val lines = df.select(id, explode(split(text, "\\n+")).as("line"))
      .select(id, trim(col("line")).as("line"))
      .filter(col("line") =!= "")
    val perLine = lines.groupBy(id, md5(col("line").cast("binary")).as("h"))
      .agg(count(lit(1)).as("c"),
        max(length(col("line"))).cast("long").as("len"),
        max(when(regexp_count(col("line"), lit(BulletRe)) > 0, 1L)
          .otherwise(0L)).as("is_bullet"),
        max(when(regexp_count(col("line"), lit(EllipsisRe)) > 0, 1L)
          .otherwise(0L)).as("is_ellipsis"))
    val lineStats = perLine.groupBy(id).agg(
      sum(col("c")).as("n_lines"),
      count(lit(1)).as("n_distinct_lines"),
      sum((col("c") - 1) * col("len")).as("dup_chars"),
      sum(col("c") * col("len")).as("all_chars"),
      sum(col("c") * col("is_bullet")).as("n_bullet"),
      sum(col("c") * col("is_ellipsis")).as("n_ellipsis"))

    // ---- top n-gram mass for n = 2, 3, 4 in ONE exploded pass; the
    //      row_number is WindowGroupLimit-pruned to top-1 per (doc, n). ----
    val grams = Seq(2, 3, 4).map { n =>
      df.filter(size(toks) >= n).select(id, lit(n).as("n"),
        explode(TextOps.wordShingles(text, n)).as("gram"))
    }.reduce(_ unionByName _)
    val gramCounts = grams.groupBy(id, col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(id, col("n"))
      .orderBy(col("c").desc, col("gram").asc)
    val topGram = gramCounts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(id).agg(
        max(when(col("n") === 2, col("c"))).as("c2"),
        max(when(col("n") === 2, length(col("gram")).cast("long"))).as("g2"),
        max(when(col("n") === 3, col("c"))).as("c3"),
        max(when(col("n") === 3, length(col("gram")).cast("long"))).as("g3"),
        max(when(col("n") === 4, col("c"))).as("c4"),
        max(when(col("n") === 4, length(col("gram")).cast("long"))).as("g4"))

    // ---- repeated-5-gram coverage: span md5s → within-doc counts ≥ 2 →
    //      distinct covered positions → char mass of covered tokens. ----
    val L = 5
    val base = df.select(id, toks.as("tk"))
    val spans = base.filter(size(col("tk")) >= L).select(id, explode(
      transform(sequence(lit(1), size(col("tk")) - (L - 1)),
        i => struct(i.as("pos"),
          md5(array_join(slice(col("tk"), i, lit(L)), " ").cast("binary"))
            .as("h")))).as("sp"))
      .select(id, col("sp.pos"), col("sp.h"))
    val repeated = spans.groupBy(id, col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(id, col("h"))
    val covered = spans.join(repeated, Seq(idCol, "h"))
      .select(id, explode(sequence(col("pos"), col("pos") + (L - 1))).as("p"))
      .distinct()
    val toksPos = base.select(id, posexplode(col("tk")).as(Seq("p", "tok")))
      .select(id, (col("p") + 1).as("p"), length(col("tok")).cast("long").as("len"))
    val covStats = toksPos
      .join(covered, Seq(idCol, "p"), "left_semi")
      .groupBy(id).agg(sum(col("len")).as("cov_chars"))
    val totStats = toksPos.groupBy(id).agg(sum(col("len")).as("tot_chars"))

    // ---- assemble: per-doc aggregates join back on the id ----
    wordLevel
      .join(lineStats, Seq(idCol), "left")
      .join(topGram, Seq(idCol), "left")
      .join(covStats, Seq(idCol), "left")
      .join(totStats, Seq(idCol), "left")
      .select(id,
        col("n_tokens"), col("mean_word_len"), col("alpha_word_frac"),
        col("symbol_word_ratio"), col("n_stopwords_present"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce((col("n_lines") - col("n_distinct_lines")).cast("double") /
          col("n_lines"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_chars").cast("double") / col("all_chars"),
          lit(0.0)).as("dup_line_char_frac"),
        coalesce(col("n_bullet").cast("double") / col("n_lines"),
          lit(0.0)).as("bullet_line_frac"),
        coalesce(col("n_ellipsis").cast("double") / col("n_lines"),
          lit(0.0)).as("ellipsis_line_frac"),
        coalesce((col("c2") * col("g2")).cast("double") /
          col("__len"), lit(0.0)).as("top_2gram_char_frac"),
        coalesce((col("c3") * col("g3")).cast("double") /
          col("__len"), lit(0.0)).as("top_3gram_char_frac"),
        coalesce((col("c4") * col("g4")).cast("double") /
          col("__len"), lit(0.0)).as("top_4gram_char_frac"),
        coalesce(col("cov_chars").cast("double") / col("tot_chars"),
          lit(0.0)).as("dup_5gram_char_frac"))
  }

  /** [[repetitionSignals]] plus the boolean `gopher_keep` verdict under
    * `th` — a document passes iff every rule passes.
    */
  def gate(df: DataFrame, idCol: String, textCol: String,
      th: GopherThresholds = GopherThresholds()): DataFrame =
    repetitionSignals(df, idCol, textCol).withColumn("gopher_keep",
      col("n_tokens").between(th.minWords, th.maxWords) &&
      col("mean_word_len").between(th.minMeanWordLen, th.maxMeanWordLen) &&
      col("symbol_word_ratio") <= th.maxSymbolWordRatio &&
      col("alpha_word_frac") >= th.minAlphaWordFrac &&
      col("n_stopwords_present") >= th.minStopwordsPresent &&
      col("bullet_line_frac") <= th.maxBulletLineFrac &&
      col("ellipsis_line_frac") <= th.maxEllipsisLineFrac &&
      col("dup_line_frac") <= th.maxDupLineFrac &&
      col("dup_line_char_frac") <= th.maxDupLineCharFrac &&
      col("top_2gram_char_frac") <= th.maxTop2gramCharFrac &&
      col("top_3gram_char_frac") <= th.maxTop3gramCharFrac &&
      col("top_4gram_char_frac") <= th.maxTop4gramCharFrac &&
      col("dup_5gram_char_frac") <= th.maxDup5gramCharFrac)
}
