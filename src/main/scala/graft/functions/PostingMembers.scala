package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd posting-member extraction for the split-aware hub consumers
  * ([[graft.ext.TextAnalysis.splitContamination]]): given a posting list
  * of `(…, bucket: INT, …)` member structs, return the members with
  * `bucket < keepBelow` IF any member has `bucket ≥ requireAtLeast`,
  * else the empty array (which `explode` then drops — the gram had no
  * benchmark-split occurrence, so its members contribute nothing).
  *
  * This is `when(exists(ids, m -> m.bucket >= requireAtLeast),
  * filter(ids, m -> m.bucket < keepBelow))` as ONE static call: the HOF
  * pair runs as interpreted per-element lambda trees — two boxed
  * expression evaluations per member per row on the hub's hot filter
  * path — where this loop is compiled Scala behind a single codegen
  * call, with the existence test short-circuiting before any member is
  * copied. Kept structs are `.copy()`-ed (an UnsafeArrayData's struct
  * views alias the backing buffer; the exploded rows must own their
  * bytes). */
object PostingMembers {

  def trainHitMembers(ids: Column, keepBelow: Int, requireAtLeast: Int): Column =
    Bridge.column(TrainHitMembers(Bridge.expression(ids), keepBelow, requireAtLeast))

  /** Runtime body shared by interpreted eval and codegen. */
  def extract(arr: ArrayData, numFields: Int, bucketIdx: Int,
      keepBelow: Int, requireAtLeast: Int): ArrayData = {
    val n = arr.numElements()
    var hasRequired = false
    var i = 0
    while (i < n && !hasRequired) {
      if (arr.getStruct(i, numFields).getInt(bucketIdx) >= requireAtLeast)
        hasRequired = true
      i += 1
    }
    if (!hasRequired) PostingMembers.Empty
    else {
      val out = new java.util.ArrayList[AnyRef](n)
      var j = 0
      while (j < n) {
        val m = arr.getStruct(j, numFields)
        if (m.getInt(bucketIdx) < keepBelow) out.add(m.copy())
        j += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  private val Empty = new GenericArrayData(Array.empty[AnyRef])
}

case class TrainHitMembers(child: Expression, keepBelow: Int, requireAtLeast: Int)
    extends UnaryExpression {
  private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val bucketIdx: Int = elemType.fieldIndex("bucket")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("bucket") &&
          st(st.fieldIndex("bucket")).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRUCT<..., bucket: INT, ...>>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def prettyName: String = "graft_train_hit_members"

  override protected def nullSafeEval(input: Any): Any =
    PostingMembers.extract(input.asInstanceOf[ArrayData], elemType.size,
      bucketIdx, keepBelow, requireAtLeast)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PostingMembers.extract($c, ${elemType.size}, " +
        s"$bucketIdx, $keepBelow, $requireAtLeast)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
