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

  /** The engine-portable 60-bit md5 hash (first 15 hex digits of md5 as
    * BIGINT). See [[Hash60]]. */
  def hash60(c: Column): Column =
    Bridge.column(Hash60(Bridge.expression(c)))

  /** [[hash60]] of every n-token window of a token array, as
    * ARRAY<BIGINT>. See [[WordGramHash60]]. */
  def wordGramHash60(tokens: Column, n: Int): Column =
    Bridge.column(WordGramHash60(Bridge.expression(tokens), n))

  /** Distinct winnowing fingerprints (Schleimer et al.) of a text, as
    * ARRAY<BIGINT>. See [[WinnowFps]]. */
  def winnowFps(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(text), k, w))

  /** Apply an ordered BPE merge list to a symbol array. See
    * [[BpeApply]]. */
  def bpeApply(symbols: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApply(Bridge.expression(symbols), merges))

  /** Unicode NFC normalization of a string. See [[NfcNormalize]]. */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
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

/** First 60 bits of md5 over a string's UTF-8 bytes, as BIGINT — the
  * engine-portable hash key contract
  * ([[graft.ext.TextAnalysis.hash60]]: "first 15 md5 hex digits as
  * BIGINT", which every DuckDB oracle reproduces as
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`).
  *
  * Semantically identical to `conv(substring(md5(c), 1, 15), 16, 10)`
  * but skips that form's per-value detours — 32-char hex string
  * materialization, substring copy, and `conv`'s digit-by-digit
  * base-16 string parse — hashing digest bytes straight to the long
  * (first 8 bytes big-endian, low nibble dropped = first 15 nibbles).
  * This expression sits under EVERY shingle/fingerprint explode (it
  * runs once per n-gram occurrence — the single hottest scalar in the
  * near-dup family), so the constant-factor cost matters at corpus
  * scale. The per-thread `MessageDigest` is reused; `digest()` resets
  * it after each call. */
case class Hash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(s: Any): Any =
    Hash60.of(s.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60.of($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct winnowing fingerprints (Schleimer et al., SIGMOD'03) of one
  * text value, as one codegen'd call: the minimum [[Hash60]] of each
  * `k`-gram over every `w`-wide sliding window, first-occurrence order.
  *
  * The declarative form this replaces (posexplode every gram, hash, then
  * `min over (partition by doc order by pos rows w-1 following)` + a
  * global DISTINCT) shuffled the full GRAM TABLE (corpus-gram volume — the
  * largest exchange of q49/q51's plans, and a corpus-scale shuffle at
  * production sizes) purely to compute a PER-DOCUMENT-LOCAL function, then
  * shuffled again for the distinct. Here the whole per-row loop is one
  * static JVM method: hash each gram once, slide a monotonic deque
  * (O(ng) total), dedupe locally — the operator becomes map-only and both
  * shuffles disappear from the plan.
  *
  * Semantics are BIT-IDENTICAL to the declarative form (property test +
  * oracle gates pin this):
  *  - grams: SQL `substr(i, k)` for i = 1..max(len−k+1, 1) — a text
  *    shorter than `k` contributes itself as its one gram;
  *  - window starts: 0-based p = 0..max(ng−w+1, 1)−1, frame clipped at
  *    the gram list's end (a list shorter than `w` emits its single
  *    global minimum);
  *  - fingerprint = min h over the frame; output deduplicated per row.
  * Null text → null (explode drops it). */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, s"k=$k and w=$w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(s: Any): Any =
    WinnowFps.of(s.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.of($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  /** Distinct windowed-minimum fingerprints of `text` (see the case class
    * doc for the exact contract). Called from codegen. */
  def of(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val len = text.numChars()
    val ng = math.max(len - (k - 1), 1)
    val h = new Array[Long](ng)
    var i = 1
    while (i <= ng) {
      h(i - 1) = Hash60.of(text.substringSQL(i, k).getBytes)
      i += 1
    }
    val starts = math.max(ng - (w - 1), 1)
    // monotonic deque of gram indices with increasing hash; ties pop (the
    // kept index is the rightmost minimal one — the VALUE, which is all
    // the fingerprint keeps, is identical either way)
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long](math.min(starts, 1 << 16))
    var p = 0
    var j = 0
    while (p < starts) {
      val end = math.min(p + w, ng)
      while (j < end) {
        while (tail > head && h(deque(tail - 1)) >= h(j)) tail -= 1
        deque(tail) = j
        tail += 1
        j += 1
      }
      while (deque(head) < p) head += 1
      seen.add(h(deque(head)))
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object Hash60 {
  private val mds = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def first60(h: Array[Byte]): Long =
    (((h(0) & 0xFFL) << 56) | ((h(1) & 0xFFL) << 48) | ((h(2) & 0xFFL) << 40) |
      ((h(3) & 0xFFL) << 32) | ((h(4) & 0xFFL) << 24) | ((h(5) & 0xFFL) << 16) |
      ((h(6) & 0xFFL) << 8) | (h(7) & 0xFFL)) >>> 4

  /** First 60 bits of md5(bytes) as a non-negative long. Called from
    * codegen. */
  def of(bytes: Array[Byte]): Long = first60(mds.get().digest(bytes))

  /** [[of]] over every n-window of `ws` joined by single spaces —
    * `hash60(concat_ws(" ", slice(ws, i, n)))` for i = 1..len−n+1,
    * without building a gram string: token bytes extract ONCE per row,
    * each window feeds the digest incrementally (null tokens skipped
    * with their separator, concat_ws semantics). Called from codegen. */
  def grams(ws: org.apache.spark.sql.catalyst.util.ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = ws.numElements()
    val m = k - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val toks = new Array[Array[Byte]](k)
    var j = 0
    while (j < k) {
      toks(j) = if (ws.isNullAt(j)) null else ws.getUTF8String(j).getBytes
      j += 1
    }
    val d = mds.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var first = true
      var t = i
      while (t < i + n) {
        val b = toks(t)
        if (b != null) {
          if (!first) d.update(' '.toByte)
          d.update(b)
          first = false
        }
        t += 1
      }
      out(i) = first60(d.digest())
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Unicode NFC normalization — the canonical-composition pass that must
  * run BEFORE any hash/shingle/dedup operator on multilingual text:
  * "é" arrives both precomposed (U+00E9) and decomposed (e + U+0301)
  * in real crawls, and every byte-level hash in this engine would treat
  * those as different documents. Spark has no built-in; this wraps the
  * JDK's `java.text.Normalizer` (ICU-grade, Unicode-standard NFC) as a
  * codegen'd expression. The DuckDB oracle dual is `nfc_normalize` —
  * both implement the same Unicode algorithm, so outputs agree
  * byte-for-byte. Map-only, linear at any corpus size. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize; already-normalized strings (the overwhelmingly common
    * case) return the input object without re-encoding. Called from
    * codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Apply an ordered byte-pair-encoding merge list to a symbol array —
  * the inner loop of BPE training AND tokenization
  * ([[graft.ext.Bpe]]): for each merge (a, b) in rank order, one
  * left-to-right pass replaces every non-overlapping adjacent (a, b)
  * with the fused symbol a+b (the classic `re.sub`-per-merge semantics
  * of the original BPE implementation: non-overlapping, the scan
  * resumes AFTER the fused symbol, so "a a a" under (a,a) yields
  * ["aa","a"]).
  *
  * An Expression rather than a UDF/HOF because it runs once per
  * DISTINCT WORD per training iteration and once per word occurrence at
  * tokenization — a per-element interpreted lambda with array rebuilds
  * would dominate both. The merge list is part of the expression
  * (driver literal, like the IVF centroids), so codegen sees a constant.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  // the codegen-visible constant form of the merge table
  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b) }.toArray

  override def nullSafeEval(a: Any): Any =
    BpeApply.applyMerges(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], mergeArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeApply.applyMerges($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApply {
  /** One non-overlapping left-to-right pass of merge (a, b) over
    * `symbols`, in place semantics-wise (returns the new array and its
    * length; the input array is not mutated). Shared by the expression
    * and [[graft.ext.Bpe]]'s small-vocab local trainer so the merge rule
    * has ONE implementation. */
  def mergePass(cur: Array[String], n: Int, a: String, b: String): Array[String] = {
    val next = new Array[String](n)
    var w = 0
    var i = 0
    while (i < n) {
      if (i < n - 1 && cur(i) == a && cur(i + 1) == b) {
        next(w) = a + b; w += 1; i += 2
      } else {
        next(w) = cur(i); w += 1; i += 1
      }
    }
    java.util.Arrays.copyOf(next, w)
  }

  /** One pass per merge over the symbol list. Called from codegen. */
  def applyMerges(symbols: org.apache.spark.sql.catalyst.util.ArrayData,
      merges: Array[Array[String]])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = symbols.numElements()
    var cur = new Array[String](k)
    var n = 0
    var j = 0
    while (j < k) {
      if (!symbols.isNullAt(j)) { cur(n) = symbols.getUTF8String(j).toString; n += 1 }
      j += 1
    }
    var m = 0
    while (m < merges.length && n > 1) {
      cur = mergePass(cur, n, merges(m)(0), merges(m)(1))
      n = cur.length
      m += 1
    }
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var t = 0
    while (t < n) {
      out(t) = org.apache.spark.unsafe.types.UTF8String.fromString(cur(t)); t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }
}

/** [[Hash60]] of every n-token window of an ARRAY<STRING> — the fused
  * form of the shingle generator
  * `transform(sequence(1, len−n+1), i -> hash60(concat_ws(' ', slice(ws, i, n))))`,
  * which pays an interpreted lambda, a slice allocation, and a gram
  * string per WINDOW. This expression extracts token bytes once per row
  * and runs one tight digest loop (bit-identical output, equality-tested
  * against the composed form). Short arrays (< n tokens) yield an empty
  * array — callers keep their `size(ws) >= n` filter to match the
  * oracle's generate_series semantics explicitly. */
case class WordGramHash60(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"window must be positive: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_gram_hash60"

  override def nullSafeEval(a: Any): Any =
    Hash60.grams(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60.grams($c, $n);")

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
