package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-warehouse model scoring compiled to Catalyst expressions — the
  * operator-fusion idea (run the inference inside the scan projection, no
  * UDF, no per-row interpreter): a linear/logistic scorer becomes one fused
  * arithmetic Column, a decision tree becomes a nested CASE expression.
  * Both stay inside whole-stage codegen, shuffle nothing, and read like the
  * SQL a feature store would emit.
  *
  * Determinism: the score is a fixed-order chain of IEEE double ops over
  * deterministic features, so any ANSI engine reproduces it bit-for-bit —
  * which is also what makes these oracle-checkable.
  */
object Scoring extends Serializable {

  /** Fused linear score Σ wᵢ·xᵢ + b, built left-to-right in the weights'
    * order (evaluation order IS the contract — float addition is not
    * associative, so the written order must match the SQL twin's).
    */
  def linearScore(weights: Seq[(Column, Double)], bias: Double): Column =
    weights.foldLeft(lit(bias)) { case (acc, (x, w)) => acc + x * w }

  /** Linear classifier columns: raw margin and thresholded label. */
  def scoreLinear(df: DataFrame, weights: Seq[(String, Double)],
      bias: Double, outCol: String): DataFrame = {
    val margin = linearScore(weights.map { case (c, w) => (col(c), w) }, bias)
    df.withColumn(outCol, margin)
      .withColumn(outCol + "_label", (margin > 0).cast("long"))
  }

  /** A decision-tree node: either a split (feature ≤ threshold → left,
    * else right; a NULL feature follows the right branch, matching SQL's
    * CASE fall-through) or a leaf emitting (leafId, value).
    */
  sealed trait Node
  final case class Split(feature: String, threshold: Double,
      left: Node, right: Node) extends Node
  final case class Leaf(id: Long, value: Double) extends Node

  /** Compile a tree to two fused Columns: the leaf id and the leaf value —
    * one nested CASE each, zero shuffles, codegen-resident. Depth is the
    * model's, typically ≤ 10; the expression tree stays small enough for
    * codegen either way.
    */
  def treeColumns(root: Node): (Column, Column) = {
    def go(n: Node, f: Leaf => Column): Column = n match {
      case l: Leaf => f(l)
      case Split(feat, thr, l, r) =>
        when(col(feat) <= thr, go(l, f)).otherwise(go(r, f))
    }
    (go(root, l => lit(l.id)), go(root, l => lit(l.value)))
  }

  /** Score a tree model: appends leaf id + leaf value columns. */
  def scoreTree(df: DataFrame, root: Node, outCol: String): DataFrame = {
    val (leaf, value) = treeColumns(root)
    df.withColumn(outCol + "_leaf", leaf).withColumn(outCol, value)
  }

  /** SQL twin of [[treeColumns]] for oracle text: the identical nested
    * CASE, emitting the leaf field chosen by `asValue`.
    */
  def treeSql(root: Node, asValue: Boolean): String = root match {
    case Leaf(id, v) => if (asValue) v.toString else id.toString
    case Split(f, thr, l, r) =>
      s"(CASE WHEN $f <= $thr THEN ${treeSql(l, asValue)} " +
        s"ELSE ${treeSql(r, asValue)} END)"
  }

  /** SQL twin of [[linearScore]] — same left-to-right order. */
  def linearSql(weights: Seq[(String, Double)], bias: Double): String =
    weights.foldLeft(bias.toString) { case (acc, (c, w)) => s"($acc + $c * $w)" }
}
