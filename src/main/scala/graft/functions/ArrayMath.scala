package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, RowOrdering}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd array math for the similarity/ANN operators.
  *
  * The dot-product/cosine hot path evaluates once per CANDIDATE PAIR (|Q|·|B|
  * times in brute-force scoring), so it must stay inside whole-stage codegen:
  * the higher-order-function form (`aggregate(zip_with(...))`) interprets the
  * lambda per element and allocates a boxed intermediate array per pair,
  * which dominates the plan at scale. These expressions generate a tight
  * primitive loop over the two `ArrayData` buffers instead — no allocation,
  * no boxing, no virtual calls per element.
  *
  * Numeric contracts (see [[graft.ext.Similarity]] for why this matters to
  * the cross-engine oracle):
  *   - [[ArrayDotLong]] folds BIGINT exactly, left to right — associativity
  *     is moot because the result is exact.
  *   - [[ArrayDotDouble]] and [[ArrayCosine]] accumulate in double, left to
  *     right, bit-identical to the equivalent `aggregate(zip_with(...))`
  *     fold they replace.
  */
object ArrayMath {
  private def c2e(c: Column): Expression = Bridge.expression(c)

  /** Exact BIGINT dot product of two ARRAY<BIGINT> columns. */
  def dotLong(a: Column, b: Column): Column =
    Bridge.column(ArrayDotLong(c2e(a), c2e(b)))

  /** Double dot product of two numeric-array columns. */
  def dotDouble(a: Column, b: Column): Column =
    Bridge.column(ArrayDotDouble(c2e(a), c2e(b)))

  /** Single-pass cosine similarity of two numeric-array columns:
    * dot/(√Σa²·√Σb²), accumulated in double. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(ArrayCosine(c2e(a), c2e(b)))

  /** Merge-scan intersection size of two sorted, duplicate-free arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(c2e(a), c2e(b)))

  /** ARRAY<DOUBLE> literal in PRIMITIVE layout ([[UnsafeArrayData]]).
    * `typedLit(Array[Double])` converts to a GenericArrayData of BOXED
    * doubles — every `getDouble` in a scoring loop then pays an unbox and
    * a megamorphic dispatch, which dominates the dot-product kernels these
    * literals feed (centroids, hyperplanes, codebooks evaluate once per
    * row × once per cell/plane/code). The unsafe layout reads like a
    * primitive array in both the codegen and interpreted paths. */
  def doubleArrayLit(a: Array[Double]): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(a),
      ArrayType(DoubleType, containsNull = false)))

  /** [[doubleArrayLit]] for BIGINT centroids/codebooks (same unsafe
    * primitive layout rationale). */
  def longArrayLit(a: Array[Long]): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(a),
      ArrayType(LongType, containsNull = false)))

  private[functions] def numericElem(e: Expression): DataType = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType | LongType | IntegerType | ShortType), _) => et
    case other => throw new IllegalStateException(s"unsupported array type $other")
  }

  private[functions] def checkNumericArrays(name: String, es: Seq[Expression]): TypeCheckResult = {
    val ok = es.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType | ShortType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires numeric array inputs, got ${es.map(_.dataType.sql).mkString(", ")}")
  }

  /** Java source for element i of `arr` widened to double. */
  private[functions] def getD(arr: String, et: DataType, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  /** Interpreted accessor mirroring [[getD]]. */
  private[functions] def evalD(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case LongType    => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  /** True when either side's array type admits null elements — the null
    * checks (a branch per element in the hot loop) are emitted only then;
    * statically null-free arrays (e.g. collect_list output) pay nothing. */
  private[functions] def mayHaveNullElems(es: Seq[Expression]): Boolean =
    es.exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  /** Codegen guard: on a null element, null out the whole result — the
    * behavior of the `aggregate(zip_with(...))` HOF folds these loops
    * replace (null propagates through the lambda into the accumulator). */
  private[functions] def nullElemGuard(enabled: Boolean, ev: ExprCode,
      a: String, b: String, i: String): String =
    if (!enabled) ""
    else s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
}

/** Exact integer dot product: ARRAY<BIGINT> × ARRAY<BIGINT> → BIGINT.
  * 16-bit fixed-point components over ≤2²⁰ dims cannot overflow. */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> inputs, got " +
        Seq(left, right).map(_.dataType.sql).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"
  // a null ELEMENT nulls the result (HOF-fold semantics), so the output is
  // nullable whenever the element type admits nulls — without this, codegen
  // would emit ev.isNull as the false literal and the guard couldn't fire.
  override def nullable: Boolean =
    super.nullable || ArrayMath.mayHaveNullElems(Seq(left, right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i); i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkNulls = ArrayMath.mayHaveNullElems(Seq(left, right))
    val (n, acc, i) = (ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      long $acc = 0L;
      for (int $i = 0; $i < $n; $i++) {
        ${ArrayMath.nullElemGuard(checkNulls, ev, a, b, i)}
        $acc += $a.getLong($i) * $b.getLong($i);
      }
      ${ev.value} = $acc;
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Double dot product over numeric arrays (FLOAT/DOUBLE/INT/BIGINT/SMALLINT),
  * elements widened to double, accumulated left to right. */
case class ArrayDotDouble(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ArrayMath.checkNumericArrays(prettyName, Seq(left, right))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_double"
  override def nullable: Boolean =
    super.nullable || ArrayMath.mayHaveNullElems(Seq(left, right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (et1, et2) = (ArrayMath.numericElem(left), ArrayMath.numericElem(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += ArrayMath.evalD(x, et1, i) * ArrayMath.evalD(y, et2, i); i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkNulls = ArrayMath.mayHaveNullElems(Seq(left, right))
    val (et1, et2) = (ArrayMath.numericElem(left), ArrayMath.numericElem(right))
    val (n, acc, i) = (ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $acc = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        ${ArrayMath.nullElemGuard(checkNulls, ev, a, b, i)}
        $acc += (${ArrayMath.getD(a, et1, i)}) * (${ArrayMath.getD(b, et2, i)});
      }
      ${ev.value} = $acc;
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Single-pass cosine similarity over numeric arrays: three double
  * accumulators (dot, ‖a‖², ‖b‖²) in one loop, result dot/(√·√).
  * A zero-norm side yields 0.0 (not NaN — Spark sorts NaN as the LARGEST
  * double, so a NaN cosine would rank a zero vector #1 in every top-k). */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ArrayMath.checkNumericArrays(prettyName, Seq(left, right))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean =
    super.nullable || ArrayMath.mayHaveNullElems(Seq(left, right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (et1, et2) = (ArrayMath.numericElem(left), ArrayMath.numericElem(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = ArrayMath.evalD(x, et1, i)
      val yv = ArrayMath.evalD(y, et2, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkNulls = ArrayMath.mayHaveNullElems(Seq(left, right))
    val (et1, et2) = (ArrayMath.numericElem(left), ArrayMath.numericElem(right))
    val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
    val (dot, na, nb) = (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"))
    val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0, $na = 0.0, $nb = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        ${ArrayMath.nullElemGuard(checkNulls, ev, a, b, i)}
        double $xv = ${ArrayMath.getD(a, et1, i)};
        double $yv = ${ArrayMath.getD(b, et2, i)};
        $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
      }
      if (!${ev.isNull}) {
        ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
          : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Intersection size of two SORTED arrays (same element type, same order,
  * no duplicates — the contract of graft's shingle-array hubs): a single
  * O(n+m) merge scan, codegen'd. Replaces `size(array_intersect(...))`,
  * whose per-call hash-set build dominates near-dup verification.
  *
  * Null elements never match (SQL: null = null is not true) and are
  * skipped; `sort_array` places them first, so the skip preserves the
  * merge order. The hub arrays (collect_list output) are statically
  * null-free and pay no check.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b && RowOrdering.isOrderable(a) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of one orderable element type, got " +
        Seq(left, right).map(_.dataType.sql).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = ordering.compare(x.get(i, elemType), y.get(j, elemType))
        if (cmp == 0) { c += 1L; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val checkNulls = ArrayMath.mayHaveNullElems(Seq(left, right))
    val jt = CodeGenerator.javaType(elemType)
    val (nx, ny) = (ctx.freshName("nx"), ctx.freshName("ny"))
    val (i, j, c) = (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
    val (xv, yv, cmp) = (ctx.freshName("xv"), ctx.freshName("yv"), ctx.freshName("cmp"))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $nx = $a.numElements(); int $ny = $b.numElements();
      int $i = 0; int $j = 0; long $c = 0L;
      while ($i < $nx && $j < $ny) {
        ${if (checkNulls) s"""if ($a.isNullAt($i)) { $i++; continue; }
        if ($b.isNullAt($j)) { $j++; continue; }""" else ""}
        $jt $xv = ${CodeGenerator.getValue(a, elemType, i)};
        $jt $yv = ${CodeGenerator.getValue(b, elemType, j)};
        int $cmp = ${ctx.genComp(elemType, xv, yv)};
        if ($cmp == 0) { $c++; $i++; $j++; }
        else if ($cmp < 0) { $i++; } else { $j++; }
      }
      ${ev.value} = $c;
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
