package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** `private[sql]` access shim (the standard extension-library pattern:
  * a subpackage of `org.apache.spark.sql` sees its package-private
  * API). Lets graft wrap an ALREADY-CONSTRUCTED Catalyst expression in
  * a classic `Column` — the sketch-probe builders need this so a
  * multi-MB sketch goes straight into the expression's constructor
  * field and never exists as a `Literal` in any plan, resolved or not
  * (a large Literal costs O(length) per tree hash/compare in every
  * analyzer rule that touches it; see [[graft.functions.CmsProbe]]).
  */
object ColumnShim {

  /** Wrap an expression in a Column without a registry round-trip. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst expression behind a classic Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The RDD backing a checkpointed Dataset (its analyzed plan is a
    * `LogicalRDD`); None for any other plan. Lets an iterative operator
    * free a superseded round's checkpoint storage (unpersist local
    * blocks / delete durable files) instead of accumulating one copy
    * per round — see `graft.operators.ConnectedComponents`.
    */
  def backingRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
}
