package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's Catalyst expressions and the public Column
  * API. Spark 4 hides Expression↔Column conversion behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so
  * extension libraries expose it via a package shim — same pattern used
  * by Delta/Iceberg/Sedona for their custom expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
