package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals: wrap a raw Catalyst
  * [[Expression]] as a user-facing [[Column]] and register native
  * functions on a live session. Lives under `org.apache.spark.sql` for
  * access; keep the surface minimal.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native function builder under `name` for SQL use. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression
  ): Unit = {
    val registry =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
