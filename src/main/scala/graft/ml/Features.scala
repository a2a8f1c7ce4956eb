package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature-engineering operators for model-ready tables — the "last mile"
  * between a curated corpus/fact table and a trainer or an in-warehouse
  * scorer.
  *
  * Everything is engine-deterministic by construction (driver contract):
  * means and variances accumulate in exact DECIMAL (associative — layout
  * can't change them), and the float ops that remain (subtract, divide,
  * sqrt) are IEEE-754 correctly-rounded primitives evaluated in a fixed
  * written order, so Spark and any ANSI engine produce bit-identical
  * features.
  *
  * No stats frame carries a broadcast hint: per-group stats are usually
  * tiny but scale with the group column's cardinality, and a forced
  * broadcast of an SF-scaled aggregate is the classic cluster-killer (AQE
  * broadcasts the small cases on its own).
  */
object Features extends Serializable {

  /** Exact decimal mean as double over the NON-NULL values — SQL AVG
    * semantics (sum skips NULLs, so dividing by count(*) would bias the
    * mean toward 0 on nullable columns).
    */
  private def dmean(x: Column): Column =
    (sum(x.cast(DecimalType(18, 6))).cast("double") / count(x))

  /** Per-group z-score standardization of `valueCol`: z = (x − μ) / σ with
    * population σ computed as sqrt(E[x²] − E[x]²) from exact decimal sums.
    * A zero-variance group standardizes to 0 (the convention that keeps
    * constant features harmless). One partial-agg shuffle for the stats,
    * joined back (null-safely: a NULL group is a real group, not a dropped
    * row); μ/σ are over the group's non-NULL values (SQL AVG semantics)
    * and a NULL value standardizes to NULL. Map-only after the stats join.
    */
  def standardize(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val x = col(valueCol)
    val stats = df.groupBy(col(groupCol).as("__g"))
      .agg(dmean(x).as("__mu"), dmean(x * x).as("__musq"))
      .withColumn("__sigma",
        sqrt(greatest(col("__musq") - col("__mu") * col("__mu"), lit(0.0))))
      .drop("__musq")
    df.join(stats, col(groupCol) <=> col("__g"))
      .withColumn(outCol,
        when(x.isNull, lit(null).cast("double"))
          .when(col("__sigma") > 0, (x - col("__mu")) / col("__sigma"))
          .otherwise(lit(0.0)))
      .drop("__g", "__mu", "__sigma")
  }

  /** Min-max scaling of `valueCol` into [0, 1] per group (constant groups
    * scale to 0; NULL values scale to NULL, NULL groups are real groups).
    * Same stats-then-join shape as [[standardize]].
    */
  def minMaxScale(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val x = col(valueCol)
    val stats = df.groupBy(col(groupCol).as("__g"))
      .agg(min(x).as("__lo"), max(x).as("__hi"))
    df.join(stats, col(groupCol) <=> col("__g"))
      .withColumn(outCol,
        when(x.isNull, lit(null).cast("double"))
          .when(col("__hi") > col("__lo"),
            (x - col("__lo")) / (col("__hi") - col("__lo")))
          .otherwise(lit(0.0)))
      .drop("__g", "__lo", "__hi")
  }

  /** Deterministic categorical index: each distinct value of `catCol` gets
    * its rank in value order (0-based), appended as `outCol`, plus the
    * category count as `outCol + "_n"`. The rank (and count) run over the
    * DISTINCT dimension only — a category-cardinality frame, where a
    * single-partition window is a non-event — and join back; the fact
    * table never sorts. No driver action: the count rides the same window.
    */
  def categoryIndex(df: DataFrame, catCol: String, outCol: String): DataFrame = {
    val w = Window.orderBy(col("__cat"))
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val dim = df.select(col(catCol).as("__cat")).distinct()
      .withColumn(outCol, (row_number().over(w) - 1).cast("long"))
      .withColumn(outCol + "_n", count(lit(1)).over(wAll))
    // null-safe: a NULL category is a category (Spark windows sort NULL
    // first, so it gets index 0), not a silently dropped row
    df.join(dim, col(catCol) <=> col("__cat")).drop("__cat")
  }
}
