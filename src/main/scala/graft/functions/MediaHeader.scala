package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header sniffing for multimodal BINARY columns — the
  * codec-FREE half of media ingest: format identification and the
  * dimensions/audio parameters that live in the container header
  * (PNG IHDR, GIF logical screen descriptor, JPEG SOF, WAV fmt/data
  * chunks). Pixel/sample DECODING needs real codecs and stays behind
  * [[graft.ext.Multimodal.decodeStub]]; header metadata does not — a
  * 100 TB media crawl filters/routes/audits on exactly these fields
  * (drop sub-64px thumbnails, split audio by sample rate, quarantine
  * format-vs-extension mismatches) before any codec runs.
  *
  * One codegen'd expression per payload, reading only the first bytes
  * (JPEG: a marker walk to the first SOF) — no allocation beyond the
  * result row, no shuffle, prunes to nothing when unused.
  */
object MediaHeaderFns {
  /** Parse the container header of a BINARY column. See [[MediaHeader]]. */
  def mediaHeader(c: Column): Column =
    Bridge.column(MediaHeader(Bridge.expression(c)))
}

/** `media_header(payload)` → STRUCT(format, width, height, sample_rate,
  * channels, duration_ms). Unrecognized/truncated payloads yield
  * format 'unknown' with null fields — never an error (a crawl contains
  * garbage; the sniffer's job is to SAY so). */
case class MediaHeader(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${other.sql}")
  }
  override def dataType: DataType = MediaHeader.schema
  override def prettyName: String = "graft_media_header"

  override def nullSafeEval(a: Any): Any =
    MediaHeader.parse(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaHeader.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16).toLong |
      (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL

  private def row(format: String, width: java.lang.Integer = null,
      height: java.lang.Integer = null, sampleRate: java.lang.Integer = null,
      channels: java.lang.Integer = null, durationMs: java.lang.Long = null): InternalRow =
    InternalRow(UTF8String.fromString(format), width, height, sampleRate,
      channels, durationMs)

  private val Unknown = "unknown"

  /** Parse a payload's container header. Called from codegen. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return row(Unknown)
    // PNG: 8-byte signature, then IHDR chunk (len+type+data): width/height
    // are big-endian ints at offsets 16/20
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && u8(b, 4) == 0x0D && u8(b, 5) == 0x0A &&
        u8(b, 6) == 0x1A && u8(b, 7) == 0x0A)
      return row("png", be32(b, 16), be32(b, 20))
    // GIF: "GIF87a"/"GIF89a", logical screen w/h little-endian at 6/8
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: FFD8, then marker segments; dimensions sit in the first SOFn
    // (C0-CF except C4/C8/CC): height BE at +5, width BE at +7
    if (b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xFF) {
        val m = u8(b, i + 1)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (i + 8 < b.length)
            return row("jpeg", be16(b, i + 7), be16(b, i + 5))
          return row("jpeg")
        }
        if (m == 0xFF) i += 1 // fill byte before a marker (spec-legal)
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
        else if (m == 0xD9 || m == 0xDA) return row("jpeg") // EOI / scan data
        else i += 2 + be16(b, i + 2)
      }
      return row("jpeg")
    }
    // WAV: RIFF....WAVE, then chunks; fmt carries channels/sample_rate/
    // byte_rate, data's size over byte_rate gives the PCM duration
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // Long cursor: chunk sizes are UNSIGNED 32-bit — truncating to Int
      // turns an adversarial 0xFFFFFFF8 size into a negative step (an
      // infinite loop or a negative array index); advancing in Long past
      // the buffer just ends the walk
      var i = 12L
      var channels: java.lang.Integer = null
      var rate: java.lang.Integer = null
      var byteRate = 0L
      var dataLen = -1L
      while (i + 8 <= b.length) {
        val j = i.toInt
        val isFmt = b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' '
        val isData = b(j) == 'd' && b(j + 1) == 'a' && b(j + 2) == 't' && b(j + 3) == 'a'
        val size = le32(b, j + 4)
        if (isFmt && j + 8 + 12 <= b.length) {
          channels = le16(b, j + 10)
          rate = le32(b, j + 12).toInt
          byteRate = le32(b, j + 16)
        }
        if (isData) dataLen = size
        i += 8L + size + (size & 1L) // chunks are word-aligned
      }
      val dur: java.lang.Long =
        if (dataLen >= 0 && byteRate > 0) java.lang.Long.valueOf(dataLen * 1000L / byteRate)
        else null
      return row("wav", null, null, rate, channels, dur)
    }
    row(Unknown)
  }
}
