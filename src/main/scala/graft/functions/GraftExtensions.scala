package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom Catalyst expressions for SQL use:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * The Scala DataFrame surface ([[ArrayMath]]) does not require this — it
  * builds Columns directly — but SQL users get the same codegen'd functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_dot_long", classOf[ArrayDotLong],
      "exact BIGINT dot product of two ARRAY<BIGINT>",
      es => ArrayDotLong(es(0), es(1))))
    ext.injectFunction(fn("graft_dot_double", classOf[ArrayDotDouble],
      "double dot product of two numeric arrays",
      es => ArrayDotDouble(es(0), es(1))))
    ext.injectFunction(fn("graft_cosine", classOf[ArrayCosine],
      "cosine similarity of two numeric arrays",
      es => ArrayCosine(es(0), es(1))))
  }
}

object GraftExtensions {
  private def fn(name: String, cls: Class[_], usage: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
}
