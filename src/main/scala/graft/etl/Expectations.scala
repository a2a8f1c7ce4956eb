package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the assertion suite a pipeline
  * runs against a table before releasing it (the Great-Expectations /
  * dbt-test shape, as exact Spark aggregations). Three rule families:
  *
  *  - row predicates ([[Expectation]]): any boolean Column; a row violates
  *    when the predicate is false OR NULL (three-valued logic never lets a
  *    NULL slip through a range check). ALL row rules fuse into ONE corpus
  *    scan — one partial-aggregated job regardless of rule count.
  *  - uniqueness: violations = rows beyond the first per key tuple, via
  *    count(*) − count(DISTINCT key) with chr(2) NULL normalization so
  *    NULL keys count like any other value.
  *  - referential integrity: rows whose key tuple has no match in a
  *    reference frame (broadcast when small — the dimension-lookup shape).
  *
  * Output of every family: (rule, checked, violations, pass 0|1) — a
  * machine-checkable release report that composes with [[Profile.drift]]
  * and the JobRunner gates. Complements Profile: Profile DESCRIBES a
  * table, Expectations JUDGES it against a contract.
  */
object Expectations {

  /** One named row-level rule: `predicate` must hold on every row. */
  final case class Expectation(name: String, predicate: Column)

  private val ReportCols =
    Seq(col("rule"), col("checked").cast("long").as("checked"),
      col("violations").cast("long").as("violations"),
      when(col("violations") === 0, 1L).otherwise(0L).as("pass"))

  /** All row predicates in ONE scan: conditional sums + a stack unpivot. */
  def rowReport(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be unique")
    val aggs = count(lit(1)).as("__checked") +: rules.zipWithIndex.map {
      case (r, i) =>
        coalesce(sum(when(r.predicate, 0L).otherwise(1L)), lit(0L))
          .as(s"__v_$i")
    }
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name.replace("'", "''")}', __v_$i" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("__checked AS checked",
        s"stack(${rules.size}, $stackArgs) AS (rule, violations)")
      .select(ReportCols: _*)
  }

  /** Uniqueness rule: violations = duplicate rows beyond the first per
    * distinct `cols` tuple (NULLs normalized so they group like values).
    */
  def uniqueReport(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "unique rule needs at least one column")
    val key = cols.map(c => coalesce(col(c).cast("string"), lit("\u0002")))
    df.agg(count(lit(1)).as("checked"),
        (count(lit(1)) - countDistinct(concat_ws("\u0001", key: _*)))
          .as("violations"))
      .select(lit(name).as("rule") +: ReportCols.tail: _*)
  }

  /** Referential-integrity rule: violations = rows of `df` whose `cols`
    * tuple does not appear in `ref`'s `refCols`. NULL foreign keys violate
    * (they match nothing, as in a SQL anti-join).
    */
  def refIntegrityReport(df: DataFrame, name: String, cols: Seq[String],
      ref: DataFrame, refCols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size == refCols.size,
      "refIntegrity needs matching non-empty column lists")
    val refKeys = ref.select(refCols.zip(cols).map { case (rc, c) =>
      col(rc).as(c)
    }: _*).distinct()
    val matched = df.join(refKeys, cols, "left_semi").agg(count(lit(1)))
      .withColumnRenamed("count(1)", "matched")
    val total = df.agg(count(lit(1)).as("checked"))
    total.crossJoin(matched)
      .select(lit(name).as("rule"), col("checked"),
        (col("checked") - col("matched")).as("violations"))
      .select(ReportCols: _*)
  }

  /** The full suite: row rules (one scan) ∪ uniqueness ∪ ref-integrity. */
  def report(df: DataFrame, rows: Seq[Expectation],
      uniques: Seq[(String, Seq[String])] = Nil,
      refs: Seq[(String, Seq[String], DataFrame, Seq[String])] = Nil)
      : DataFrame = {
    val parts =
      (if (rows.nonEmpty) Seq(rowReport(df, rows)) else Nil) ++
        uniques.map { case (n, cs) => uniqueReport(df, n, cs) } ++
        refs.map { case (n, cs, r, rcs) => refIntegrityReport(df, n, cs, r, rcs) }
    require(parts.nonEmpty, "need at least one rule")
    parts.reduce(_.unionByName(_))
  }
}
