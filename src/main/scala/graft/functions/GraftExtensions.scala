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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** All custom expressions, as injectFunction-shaped entries (shared
    * with the test-side registry registration — one source of truth for
    * what "SQL-registered" means). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_dot_long", classOf[ArrayDotLong],
      es => ArrayDotLong(es(0), es(1))),
    fn("graft_dot_double", classOf[ArrayDotDouble],
      es => ArrayDotDouble(es(0), es(1))),
    fn("graft_cosine", classOf[ArrayCosine],
      es => ArrayCosine(es(0), es(1))),
    fn("graft_sorted_intersect_count", classOf[SortedIntersectCount],
      es => SortedIntersectCount(es(0), es(1))),
    // 1-arg SQL form at the default deflate level (the Scala surface
    // exposes the level knob)
    fn("graft_deflate_len", classOf[DeflateLength],
      es => DeflateLength(es(0), level = 6)),
    fn("graft_hash60", classOf[Hash60],
      es => Hash60(es(0))),
    fn("graft_nfc", classOf[NfcNormalize],
      es => NfcNormalize(es(0))),
    // the n parameter must be a foldable literal in the SQL form (it
    // shapes the generated call site, like deflate's level)
    fn("graft_char_ngram_set", classOf[CharNgramSet],
      es => CharNgramSet(es(0), foldToInt(es(1), "graft_char_ngram_set"))),
    fn("graft_word_ngram_set", classOf[WordNgramSet],
      es => WordNgramSet(es(0), foldToInt(es(1), "graft_word_ngram_set"))),
    fn("graft_word_gram_seq", classOf[WordGramSeq],
      es => WordGramSeq(es(0), foldToInt(es(1), "graft_word_gram_seq"))),
    // aggregate: the analyzer wraps a bare AggregateFunction from a
    // registry builder in AggregateExpression during resolution
    fn("graft_sum_long_array", classOf[SumLongArray],
      es => SumLongArray(es(0))))

  private def foldToInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name: n must be a literal integer, got ${e.sql}")
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name: n must be an integer literal, got $other")
    }
  }

  private def fn(name: String, cls: Class[_],
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
}
