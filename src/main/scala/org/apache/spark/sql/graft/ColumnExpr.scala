package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Spark 4 made `Column` engine-agnostic: it wraps a lazy `ColumnNode` tree,
  * and the Catalyst expression only materializes during analysis. This shim
  * (in the sql package namespace, where the `private[sql]` converters are
  * visible) eagerly converts Column → Catalyst Expression for the graft
  * file pruner. */
object ColumnExpr {
  def of(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
