package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Column builders for the text-metric expressions. */
object TextMetrics {
  /** Deflate-compressed byte length of a string (UTF-8 bytes, raw deflate,
    * fixed `level`). See [[DeflateLength]]. */
  def deflateLen(c: Column, level: Int = 6): Column =
    Bridge.column(DeflateLength(Bridge.expression(c), level))
}

/** zlib-deflate length of a string's UTF-8 bytes — the engine primitive
  * behind the compression-ratio quality filter (Gopher/Dolma-class
  * pipelines drop documents whose bytes compress too well: repetitive,
  * template, or degenerate text; or too poorly: binary junk in a text
  * field).
  *
  * This must be an Expression, not a UDF: it runs once per document over
  * the whole corpus, and the UDF path would pay encoder round-trips per
  * row. Codegen emits one static call on the raw `UTF8String` bytes; the
  * per-thread `Deflater` is reused via reset() — a fresh native zlib
  * stream per row would dominate the scan.
  *
  * Determinism: fixed level, default strategy, raw mode (no zlib header
  * timestamps — deflate output depends only on input bytes, level, and
  * strategy), so the column is reproducible run to run on the same zlib.
  * No DuckDB dual exists → its queries are rows-only-gated by design,
  * with semantics asserted in ScalaTest.
  */
case class DeflateLength(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 0 && level <= 9, s"deflate level out of range: $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(s: Any): Any =
    DeflateLength.lenOf(s.asInstanceOf[UTF8String].getBytes, level)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLength.lenOf($c.getBytes(), $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {
  // one native zlib stream per (executor thread, level) — reset() between
  // rows instead of re-allocating; levels form a tiny fixed domain
  private val pool = new ThreadLocal[java.util.HashMap[Integer, Deflater]] {
    override def initialValue() = new java.util.HashMap[Integer, Deflater]
  }

  /** Raw-deflate length of `bytes` at `level`. Called from codegen. */
  def lenOf(bytes: Array[Byte], level: Int): Long = {
    val m = pool.get()
    var d = m.get(level)
    if (d == null) { d = new Deflater(level, true); m.put(level, d) }
    else d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
