package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd shingle-set builders — the per-row hot path of the whole
  * near-dup/text-analysis family (every posting hub and every df count
  * starts with "distinct n-grams of this document").
  *
  * The declarative forms these replace
  * (`array_distinct(transform(sequence(...), i => substr/concat_ws(...)))`)
  * run as INTERPRETED higher-order-function lambdas: one boxed
  * expression-tree evaluation per gram per row, which profiling showed
  * dominating q54's warm run (~0.5 s of interpreted lambda machinery at
  * sf0.1 to produce 2.4M grams) and the cold hub builds of
  * q37/q38/q48/q59/q61. Here the whole per-row loop is one static JVM
  * method over `UTF8String` — whole-stage codegen emits a single call,
  * and the JIT sees a tight monomorphic loop.
  *
  * Semantics are BIT-IDENTICAL to the declarative forms (the ScalaCheck
  * equivalence property in `WordGramHash60`-style gates and the full
  * oracle suite pin this):
  *
  *  - char grams: SQL `substr(i, n)` positions 1..max(len-n+1, 1) — a
  *    text shorter than `n` contributes itself as its one shingle; the
  *    empty string contributes [""].
  *  - word grams: split on the literal single space with limit -1
  *    (trailing empties kept — the `split` dialect rule, §7.4), windows
  *    of `n` tokens joined by one space; fewer than `n` tokens → all
  *    tokens as one gram.
  *  - distinct = first-occurrence order (array_distinct's contract);
  *    every consumer treats the result as a set.
  *  - null text → null (explode drops it).
  */
object TextShingles {

  /** Distinct char n-gram set of `text` (see class doc). */
  def charNgramSet(text: Column, n: Int): Column =
    Bridge.column(CharNgramSet(Bridge.expression(text), n))

  /** Distinct word n-gram set of `text` (see class doc). */
  def wordNgramSet(text: Column, n: Int): Column =
    Bridge.column(WordNgramSet(Bridge.expression(text), n))

  /** POSITIONAL word n-gram sequence of `text`: element `i` (0-based) is
    * the gram starting at token `i+1`, in order, duplicates kept — the
    * builder for position-aware consumers ([[graft.ext.Dedup.repeatedSpans]])
    * where array index IS the token position. Texts with fewer than `n`
    * tokens yield an EMPTY array (no short-text fallback: a span operator
    * must never manufacture a "window" shorter than its gram width — the
    * deliberate contrast with the set builders' whole-text-as-one-gram
    * rule, which exists for set-similarity, not positions). */
  def wordGramSeq(text: Column, n: Int): Column =
    Bridge.column(WordGramSeq(Bridge.expression(text), n))

  // Runtime bodies, shared by interpreted eval and codegen (codegen emits
  // one static call — the loop itself is compiled Scala, not generated
  // Java, so there is exactly one implementation to trust).

  def charGrams(text: UTF8String, n: Int): GenericArrayData = {
    val len = text.numChars()
    val count = math.max(len - (n - 1), 1)
    val set = new java.util.LinkedHashSet[UTF8String](Math.min(count, 1 << 16))
    var i = 1
    while (i <= count) { set.add(text.substringSQL(i, n)); i += 1 }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  def wordGrams(text: UTF8String, n: Int): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    val count = math.max(ws.length - (n - 1), 1)
    val set = new java.util.LinkedHashSet[UTF8String](Math.min(count, 1 << 16))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = Math.min(i + n, ws.length)
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(ws(j)); j += 1 }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  def wordGramPositional(text: UTF8String, n: Int): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    val count = ws.length - (n - 1)
    if (count <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = i
      while (j < i + n) { if (j > i) sb.append(' '); sb.append(ws(j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def checkString(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name requires STRING input, got ${t.sql}")
    }
}

/** `array_distinct(transform(sequence(1, greatest(len-n+1, 1)), i =>
  * substr(text, i, n)))` as one codegen'd call — see [[TextShingles]]. */
case class CharNgramSet(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextShingles.checkString(child, prettyName)
  override def prettyName: String = "graft_char_ngram_set"
  override protected def nullSafeEval(input: Any): Any =
    TextShingles.charGrams(input.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.charGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `when(#tokens >= n, transform(sequence(1, #tokens-n+1), i =>
  * concat_ws(' ', slice(split(text, ' ', -1), i, n)))).otherwise(array())`
  * as one codegen'd call — the POSITIONAL gram sequence (index = token
  * position, duplicates kept, empty under n tokens); see
  * [[TextShingles.wordGramSeq]]. */
case class WordGramSeq(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextShingles.checkString(child, prettyName)
  override def prettyName: String = "graft_word_gram_seq"
  override protected def nullSafeEval(input: Any): Any =
    TextShingles.wordGramPositional(input.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.wordGramPositional($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `array_distinct(transform(sequence(1, greatest(#tokens-n+1, 1)), i =>
  * concat_ws(' ', slice(split(text, ' ', -1), i, n))))` as one codegen'd
  * call — see [[TextShingles]]. */
case class WordNgramSet(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextShingles.checkString(child, prettyName)
  override def prettyName: String = "graft_word_ngram_set"
  override protected def nullSafeEval(input: Any): Any =
    TextShingles.wordGrams(input.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.wordGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
