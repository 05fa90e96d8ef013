package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column <-> Expression converters
  * (Spark 4 moved them behind `org.apache.spark.sql.classic`). Standard
  * extension-library technique: one object inside the sql package tree so
  * custom Catalyst expressions (graft.functions.FftExpr) get a public
  * Column API without forking Spark. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
