package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit keys of every URL-domain SUFFIX mentioned in a text — the
  * per-row half of the domain-blocklist gate
  * ([[graft.ext.TextAnalysis.flagBlockedDomains]]): each
  * `http(s)://host` occurrence (the [[graft.ext.TextAnalysis.UrlDomainRe]]
  * rule — same extraction as `domainStats`) contributes the
  * [[Hash60]] key of its ASCII-lowercased host and of every parent
  * suffix down to the last label (`a.b.example.com` →
  * keys of `a.b.example.com`, `b.example.com`, `example.com`, `com`), so
  * a blocklist entry matches the exact domain AND all its subdomains —
  * the standard blocklist semantics (URL filter lists are
  * registered-domain keyed; subdomains inherit the block).
  *
  * An Expression rather than nested HOFs because the suffix walk needs
  * per-label iteration over a COMPUTED array (the split host) — exactly
  * the lambda-capture shape SURVEY §2.6 forbids; here the whole per-row
  * walk is one static codegen call. Output keys are DISTINCT in
  * first-occurrence order; no URLs → empty array; null text → null
  * (callers apply the total-pass rule).
  */
case class DomainSuffixKeys(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_domain_suffix_keys"

  override def nullSafeEval(s: Any): Any =
    DomainSuffixKeys.of(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DomainSuffixKeys.of($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DomainSuffixKeys {
  /** Column builder. */
  def of(c: Column): Column =
    Bridge.column(DomainSuffixKeys(Bridge.expression(c)))

  // compiled once; the SAME pattern string as TextAnalysis.UrlDomainRe
  // (one extraction rule for the whole domain family — asserted by test)
  private val UrlDomain =
    java.util.regex.Pattern.compile("https?://([A-Za-z0-9.-]+)")

  /** Distinct hash60 keys of all domain suffixes in `text`. Called from
    * codegen. */
  def of(text: UTF8String): GenericArrayData = {
    val m = UrlDomain.matcher(text.toString)
    val set = new java.util.LinkedHashSet[java.lang.Long]
    while (m.find()) {
      // hosts are [A-Za-z0-9.-] by the pattern, so ASCII lowercasing is
      // total (and byte-identical to the oracle's lower())
      val labels = m.group(1).toLowerCase(java.util.Locale.ROOT).split("\\.", -1)
      var i = 0
      while (i < labels.length) {
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < labels.length) {
          if (j > i) sb.append('.'); sb.append(labels(j)); j += 1
        }
        set.add(Hash60.of(sb.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)))
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
