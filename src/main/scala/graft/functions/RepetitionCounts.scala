package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition counters — the integer facts behind the
  * Gopher-style quality ratios ([[graft.ext.TextAnalysis.repetitionStats]]):
  * token count, distinct-token count, top unigram frequency, duplicated
  * occurrence count, bigram count, and top bigram frequency, in ONE pass
  * over the row's own tokens.
  *
  * Why an Expression and not SQL: every statistic is row-local, so the
  * declarative alternatives both pay structurally for locality —
  *   - the aggregate form shuffles the whole corpus by token (twice, with
  *     a join back) to compute facts each row already owns;
  *   - the array-HOF form (`filter`/`transform` over `sort_array`) runs on
  *     Spark's INTERPRETED higher-order-function path, where a lambda body
  *     re-evaluates every captured COMPUTED subtree per element — the
  *     round-12 regression: capturing `sort_array(split(...))` inside the
  *     run-boundary lambdas compounded to ~O(n³) per row and hung a 500-doc
  *     dump (SURVEY §2.6: a lambda may capture attributes and literals,
  *     never a computed subtree).
  * Here the whole per-row computation is one static JVM call under
  * whole-stage codegen: two small hash maps, linear in the document's own
  * token count, zero exchanges — the repetition filter stays a pure
  * projection at any corpus size.
  *
  * Semantics are pinned to the oracle dialect (§7.4 split rule):
  * whitespace tokens = `split(text, ' ', -1)` (consecutive/trailing
  * separators yield empty tokens, an empty string yields one empty token);
  * bigrams = adjacent token pairs joined by one space, `n−1` of them for an
  * `n ≥ 2`-token document and none below two tokens. All six counters are
  * exact non-negative longs; null text → null row (callers filter).
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def dataType: DataType = RepetitionCounts.schema
  override def prettyName: String = "graft_repetition_counts"

  override def nullSafeEval(s: Any): Any =
    RepetitionCounts.of(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionCounts.of($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("max_uni", LongType, nullable = false),
    StructField("dup_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("max_bi", LongType, nullable = false)))

  /** Column builder. */
  def of(c: Column): Column = Bridge.column(RepetitionCounts(Bridge.expression(c)))

  // (max count, Σ counts>1) of a frequency map — the two run statistics
  // both gram orders need
  private def maxAndDup(m: java.util.HashMap[String, Int]): (Long, Long) = {
    var max = 0L
    var dup = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > max) max = c
      if (c > 1) dup += c
    }
    (max, dup)
  }

  /** One linear pass over the document's tokens. Called from codegen. */
  def of(text: UTF8String): InternalRow = {
    val ws = text.toString.split(" ", -1)
    val n = ws.length
    val uni = new java.util.HashMap[String, Int](Math.min(n * 2, 1 << 16))
    // absent keys unbox to 0 (BoxesRunTime.unboxToInt(null)), so get+1 is
    // the increment for both first and repeat occurrences
    var i = 0
    while (i < n) {
      uni.put(ws(i), uni.get(ws(i)) + 1)
      i += 1
    }
    val (maxUni, dupCnt) = maxAndDup(uni)
    var nBigrams = 0L
    var maxBi = 0L
    if (n >= 2) {
      nBigrams = n - 1L
      val bi = new java.util.HashMap[String, Int](Math.min(n * 2, 1 << 16))
      var j = 0
      while (j < n - 1) {
        val b = ws(j) + " " + ws(j + 1)
        bi.put(b, bi.get(b) + 1)
        j += 1
      }
      maxBi = maxAndDup(bi)._1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, uni.size.toLong, maxUni, dupCnt, nBigrams, maxBi))
  }
}
