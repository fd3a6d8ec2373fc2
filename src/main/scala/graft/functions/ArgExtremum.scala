package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Deterministic argmax as a HASH-aggregable aggregate.
  *
  * The top-1-per-group step of [[graft.ext.Similarity.contrastivePairs]]
  * ("each anchor's best-cosine neighbor, ties to the smallest id") is
  * exactly `max(struct(score, -id))` — but a struct-typed `max` buffer is
  * not a mutable primitive, so Spark plans SortAggregate: BOTH the partial
  * and final phases sort their whole input on the group key before
  * aggregating, and the sort sits outside whole-stage codegen. This
  * aggregate keeps the buffer as TWO PRIMITIVE SLOTS (best score, best
  * id), which HashAggregateExec accepts — the scored |anchors|·|corpus|
  * stream folds group-at-a-time inside one codegen stage, and only
  * |groups| buffer rows reach the exchange.
  *
  * Ordering contract (engine-portable, matches the SQL dual
  * `row_number() OVER (ORDER BY score DESC, id ASC) = 1`):
  * higher score wins; equal scores break to the SMALLER id. Rows with a
  * null score or null id are skipped (the window dual never ranks them
  * first — its ORDER BY puts score-NULLs last); a group with no qualifying
  * row evaluates to NULL. Score NaNs are the caller's to exclude — the
  * cosine expressions here guard theirs to 0.0.
  */
object ArgExtremum {
  /** `struct(score, id)` of the group's max-score row, ties → min id. */
  def maxScoreMinId(score: Column, id: Column): Column =
    Bridge.column(MaxScoreMinId(Bridge.expression(score),
      Bridge.expression(id)).toAggregateExpression())
}

case class MaxScoreMinId(score: Expression, id: Expression)
    extends DeclarativeAggregate {

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (DOUBLE, BIGINT) input, got $other")
    }
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType)))
  override def prettyName: String = "graft_max_score_min_id"

  private lazy val bestScore = AttributeReference("bestScore", DoubleType)()
  private lazy val bestId = AttributeReference("bestId", LongType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestScore, bestId)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(null, LongType))

  // (s, i) beats (bs, bi) — null bs means "pristine buffer, anything wins"
  private def beats(s: Expression, i: Expression,
      bs: Expression, bi: Expression): Expression =
    bs.isNull || s > bs || (s === bs && i < bi)

  override lazy val updateExpressions: Seq[Expression] = {
    val take = score.isNotNull && id.isNotNull &&
      beats(score, id, bestScore, bestId)
    Seq(If(take, score, bestScore), If(take, id, bestId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = bestScore.right.isNotNull &&
      beats(bestScore.right, bestId.right, bestScore.left, bestId.left)
    Seq(If(take, bestScore.right, bestScore.left),
      If(take, bestId.right, bestId.left))
  }

  override lazy val evaluateExpression: Expression =
    If(bestScore.isNull, Literal(null, dataType),
      CreateNamedStruct(Seq(
        Literal("score"), bestScore, Literal("id"), bestId)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
