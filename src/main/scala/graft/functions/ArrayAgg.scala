package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise aggregate sums over array columns.
  *
  * The IVF/PQ trainers ([[graft.ext.Similarity]]) need per-cell component
  * sums of fixed-point vectors. The declarative form — `posexplode` every
  * component into its own row and `sum` per (cell, idx) — multiplies the
  * aggregation input by `dims` (a 10⁹-vector corpus at 64 dims becomes a
  * 6.4·10¹⁰-row shuffle). [[SumLongArray]] keeps vectors whole: one
  * `long[]` buffer per group, one element-wise add per input row, merge by
  * vector add — the map-side combine collapses each partition to
  * nGroups·dims longs regardless of row count, so the trainer's shuffle is
  * centroid-sized at any corpus scale.
  *
  * Semantics (chosen to mirror the exploded `sum` it replaces):
  *   - a NULL array contributes nothing (like a row whose explode emits
  *     no rows);
  *   - a NULL element contributes nothing at its position (like `sum`
  *     skipping a null);
  *   - ragged inputs widen the buffer to the longest array seen;
  *   - a group with no non-null input evaluates to NULL (like `sum`).
  */
object ArrayAgg {
  /** Element-wise BIGINT sum of an ARRAY<BIGINT> column (aggregate). */
  def sumLongArray(c: Column): Column =
    Bridge.column(SumLongArray(Bridge.expression(c)).toAggregateExpression())
}

case class SumLongArray(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sum_long_array"
  override def children: Seq[Expression] = Seq(child)

  // empty buffer = "nothing seen yet" → NULL result (sum-over-empty)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out =
        if (buffer.length >= math.max(n, 1)) buffer
        else java.util.Arrays.copyOf(buffer, math.max(n, 1))
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) out(i) += arr.getLong(i)
        i += 1
      }
      // an empty non-null array still marks the group non-empty: grow to
      // length ≥ 1 so eval distinguishes it from the pristine buffer — the
      // exploded dual emits no rows for it, but `sum` over present-but-
      // empty input has no dual; returning an empty ARRAY would drop the
      // distinction, so we keep a zero-padded singleton. Never occurs for
      // fixed-dims vector corpora.
      out
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) buffer
    else if (buffer.length == 0) other
    else {
      val (big, small) = if (buffer.length >= other.length) (buffer, other) else (other, buffer)
      var i = 0
      while (i < small.length) { big(i) += small(i); i += 1 }
      big
    }
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumLongArray =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumLongArray =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
