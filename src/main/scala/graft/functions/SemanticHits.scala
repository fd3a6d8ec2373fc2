package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd any-bench-vector-close test for the semantic contamination
  * gate ([[graft.ext.Similarity.flagSemanticContaminated]]).
  *
  * The expression-tree form (one `dotLong` + threshold per bench vector,
  * OR-reduced) generates code LINEAR in the bench count: at ~200 bench
  * vectors the generated method blows the JVM's 64 KB limit and the whole
  * stage falls back to interpreted evaluation (observed at the 10× scale
  * smoke). This expression is ONE generated method of constant size — a
  * nested loop over a flattened bench literal — so the gate stays inside
  * whole-stage codegen at any bench-set size the driver can hold.
  *
  * Semantics are bit-identical to the tree it replaces (the exact
  * fixed-point recipe of [[graft.ext.Similarity.exactCosinePairs]]):
  * n2x and each dot are exact BIGINT folds; cos = 0.0 when either norm
  * is zero, else dot/(√n2x·√bn2) in double; hit ⟺ any cos ≥ minCosine.
  * A null input vector — or a vector containing a null component (the
  * HOF-fold null-out contract) — yields a null flag, and so does an
  * input whose length differs from the bench dimensionality: geometry
  * drift must fail loudly like the rest of the fixed-point family,
  * never truncate to a quietly wrong cosine.
  */
object SemanticHits {

  /** `anyHit(x, benchFlat, benchN2)` — x: the row's fixed-point vector
    * (ARRAY<BIGINT>); benchFlat: nBench·dims flattened fixed-point bench
    * components; benchN2: the nBench exact squared norms. */
  def anyHit(x: Column, benchFlat: Array[Long], benchN2: Array[Long],
      nBench: Int, minCosine: Double): Column = {
    require(nBench > 0 && benchFlat.length % nBench == 0,
      s"benchFlat length ${benchFlat.length} is not a multiple of " +
        s"nBench=$nBench — a ragged or mis-flattened bench literal " +
        "would score against garbage geometry")
    require(benchN2.length == nBench,
      s"benchN2 carries ${benchN2.length} norms for nBench=$nBench")
    Bridge.column(SemanticHit(Bridge.expression(x),
      Bridge.expression(ArrayMath.longArrayLit(benchFlat)),
      Bridge.expression(ArrayMath.longArrayLit(benchN2)),
      nBench, minCosine))
  }
}

case class SemanticHit(first: Expression, second: Expression,
    third: Expression, nBench: Int, minCosine: Double)
    extends TernaryExpression {
  require(nBench > 0, s"nBench must be positive: $nBench")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> inputs, got " +
        Seq(first, second, third).map(_.dataType.sql).mkString(", "))
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_semantic_hit"
  // a null vector ELEMENT nulls the flag (the HOF-fold contract the
  // expression tree this replaces inherited from fixedPointVec/intDot)
  override def nullable: Boolean =
    super.nullable || ArrayMath.mayHaveNullElems(Seq(first))

  override def nullSafeEval(xa: Any, fa: Any, na: Any): Any = {
    val x = xa.asInstanceOf[ArrayData]
    val flat = fa.asInstanceOf[ArrayData]
    val n2s = na.asInstanceOf[ArrayData]
    val xLen = x.numElements()
    val dims = flat.numElements() / nBench
    // geometry drift fails loudly-as-null, never a silent truncated dot:
    // a dot over min(xLen, dims) with n2x folded over all of xLen is a
    // quietly wrong cosine (the fixed-point family's contract is exact)
    if (xLen != dims) return null
    var n2x = 0L
    var i = 0
    while (i < xLen) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i); n2x += v * v; i += 1
    }
    var b = 0
    while (b < nBench) {
      val bn2 = n2s.getLong(b)
      var dot = 0L
      var j = 0
      while (j < dims) { dot += x.getLong(j) * flat.getLong(b * dims + j); j += 1 }
      val cos =
        if (n2x == 0L || bn2 == 0L) 0.0
        else dot.toDouble / (math.sqrt(n2x.toDouble) * math.sqrt(bn2.toDouble))
      if (cos >= minCosine) return true
      b += 1
    }
    false
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkNulls = ArrayMath.mayHaveNullElems(Seq(first))
    val xLen = ctx.freshName("xLen")
    val dims = ctx.freshName("dims")
    val n2x = ctx.freshName("n2x")
    val (i, b, j, n) = (ctx.freshName("i"), ctx.freshName("b"),
      ctx.freshName("j"), ctx.freshName("n"))
    val (dot, bn2, cos, hit, v) = (ctx.freshName("dot"), ctx.freshName("bn2"),
      ctx.freshName("cos"), ctx.freshName("hit"), ctx.freshName("v"))
    nullSafeCodeGen(ctx, ev, (x, flat, n2s) => s"""
      int $xLen = $x.numElements();
      int $dims = $flat.numElements() / $nBench;
      long $n2x = 0L;
      boolean $hit = false;
      if ($xLen != $dims) { ${ev.isNull} = true; }
      for (int $i = 0; !${ev.isNull} && $i < $xLen; $i++) {
        ${if (checkNulls) s"if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""}
        long $v = $x.getLong($i); $n2x += $v * $v;
      }
      if (!${ev.isNull}) {
        for (int $b = 0; $b < $nBench && !$hit; $b++) {
          long $bn2 = $n2s.getLong($b);
          long $dot = 0L;
          for (int $j = 0; $j < $dims; $j++) {
            $dot += $x.getLong($j) * $flat.getLong($b * $dims + $j);
          }
          double $cos = ($n2x == 0L || $bn2 == 0L) ? 0.0
            : (double) $dot / (java.lang.Math.sqrt((double) $n2x)
              * java.lang.Math.sqrt((double) $bn2));
          if ($cos >= $minCosine) $hit = true;
        }
        ${ev.value} = $hit;
      }
    """)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}
