package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for function registration.
  *
  * Spark 4 made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so exposing graft's
  * Column-combinator helpers as SQL-registry functions needs this one-file
  * shim inside the `org.apache.spark.sql` namespace — the established
  * extension-library pattern (Delta, Sedona, Iceberg all ship such shims).
  * Nothing else in graft lives outside the `graft` package, and this object
  * adds no behavior: two delegating one-liners.
  */
object ColumnBridge {
  /** EAGER conversion (ColumnNodeToExpressionConverter), not the lazy
    * `ColumnNodeExpression` wrapper `ExpressionUtils.expression` returns:
    * function-registry builders must hand the analyzer a real Expression
    * tree (unresolved functions inside it resolve in later fixpoint
    * iterations), while the lazy wrapper survives to codegen and dies with
    * "Cannot generate code for expression: columnnodeexpression".
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
