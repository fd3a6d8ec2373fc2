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
}
