package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression converters.
  *
  * Spark 4 made these `private[sql]` (`classic.ExpressionUtils`), so custom
  * Expression libraries reach them through a subpackage bridge — the same
  * pattern other Spark-native engines use. This is the ONLY file outside
  * the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an injectFunction-shaped entry into an EXISTING session's
    * function registry — the per-session equivalent of what
    * `SparkSessionExtensions.injectFunction` does at session build
    * (`sessionState` is `private[sql]`, hence bridged). Lets tests and
    * embedded callers expose the graft SQL functions on a session they
    * didn't construct. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(fn._1, fn._2, fn._3)
}
