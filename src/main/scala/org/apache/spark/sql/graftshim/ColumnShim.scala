package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API.
  *
  * Spark 4's Column is backed by a ColumnNode, and the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, from
  * columnNodeSupport.scala in the Spark source) are `private[sql]` —
  * so this one-file shim lives under the `org.apache.spark.sql`
  * package tree, the standard pattern for Spark-native libraries that
  * ship custom expressions. Everything referenced is public Spark
  * source.
  *
  * Going through this shim (rather than `call_function`) means a
  * `Column` built from a graft expression resolves on ANY
  * SparkSession — no dependency on GraftFunctions registration order.
  */
object ColumnShim {
  /** Wrap a Catalyst expression as a Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an aggregate function as a (Complete-mode) aggregate Column. */
  def aggColumn(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression())
}
