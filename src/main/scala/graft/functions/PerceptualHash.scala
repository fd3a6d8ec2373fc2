package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Content-level perceptual fingerprints for multimodal columns — the
  * codec-free formats a [[MediaHeader]] crawl can decode with plain byte
  * arithmetic: uncompressed images (PGM P5, PPM P6, BMP 32/24/8-bit
  * BI_RGB) and WAV-PCM audio. These give the multimodal column a real DEDUP face
  * (near-identical images/audio collapse to nearby hashes) beyond the
  * header-metadata sniff; compressed formats (png/jpeg/...) need a codec
  * and yield null — exactly the [[graft.ext.Multimodal.decodeStub]]
  * boundary, with the Spark-side arithmetic fully real.
  *
  * Both hashes are pure integer functions of the payload bytes —
  * engine-portable, so a SQL oracle can re-derive them byte for byte.
  *
  * IMAGE dHash (difference hash, the classic 64-bit perceptual hash):
  * the decoded grayscale image is decimated to a 9-wide × 8-tall sample
  * grid by NEAREST-NEIGHBOR picks at x_j = j·W div 9, y_i = i·H div 8
  * (integer division — exact cross-engine, unlike an area-average
  * resize's rounding), and bit i·8+j (i, j in 0..7) is set iff
  * g(i, j) < g(i, j+1). Grayscale for BMP color: (299·R + 587·G +
  * 114·B) div 1000. A one-pixel edit moves at most a few sampled cells
  * → small Hamming distance; the gradient structure survives uniform
  * brightness shifts.
  *
  * AUDIO energy fingerprint: the PCM-16 sample stream (interleaved
  * channels as laid out in the data chunk) splits into 65 windows
  * (window w covers samples [w·n div 65, (w+1)·n div 65)), each scored
  * by its exact integer absolute-amplitude sum; bit w (0..63) is set
  * iff E_w < E_{w+1}. Differential coding makes the fingerprint
  * gain-structure-robust the same way dHash is brightness-robust.
  * Fewer than 65 samples → null (no stable energy profile).
  */
object PerceptualHashFns {
  /** 64-bit image dHash of a PGM(P5)/PPM(P6)/BMP payload; null
    * otherwise. */
  def imageDHash(c: Column): Column =
    Bridge.column(ImageDHash(Bridge.expression(c)))

  /** 64-bit differential energy fingerprint of a WAV PCM-16 payload;
    * null for other formats/encodings or under 65 samples. */
  def wavEnergyFp(c: Column): Column =
    Bridge.column(WavEnergyFp(Bridge.expression(c)))
}

private[functions] trait BinaryToLongHash extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
}

case class ImageDHash(child: Expression) extends BinaryToLongHash {
  override def prettyName: String = "graft_image_dhash"
  override def nullSafeEval(a: Any): Any =
    PerceptualHash.dHash(a.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}$$h = graft.functions.PerceptualHash.dHash($c);
      if (${ev.value}$$h == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}$$h.longValue(); }""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WavEnergyFp(child: Expression) extends BinaryToLongHash {
  override def prettyName: String = "graft_wav_energy_fp"
  override def nullSafeEval(a: Any): Any =
    PerceptualHash.wavFp(a.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}$$h = graft.functions.PerceptualHash.wavFp($c);
      if (${ev.value}$$h == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}$$h.longValue(); }""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PerceptualHash {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16s(b: Array[Byte], i: Int): Int =
    ((u8(b, i) | (u8(b, i + 1) << 8)) << 16) >> 16 // sign-extended int16
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Decoded grayscale accessor: (width, height, gray(x, y)). */
  private type Gray = (Int, Int, (Int, Int) => Int)

  /** PNM binary (PGM P5 / PPM P6): `P5|P6 <ws> W <ws> H <ws> MAXVAL
    * <single-ws> pixels`, comments (#…\n) legal in the header, maxval
    * ≤ 255 (one byte per sample; P6 carries 3 RGB samples per pixel,
    * grayed with the BMP weights). Returns null for ascii P2/P3,
    * maxval>255, or truncated pixel data. */
  private def parsePgm(b: Array[Byte]): Gray = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return null
    val rgb = b(1) == '6'
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var looping = true
      while (looping && i < b.length) {
        val c = b(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { i += 1; progressed = true }
        else if (c == '#') { while (i < b.length && b(i) != '\n') i += 1; progressed = true }
        else looping = false
      }
      progressed
    }
    def int(): Int = {
      if (!skipWs()) return -1
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
        if (v > (1 << 24)) return -1
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val mx = int()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return null
    i += 1 // exactly ONE whitespace byte separates header from pixels
    val off = i
    val bpp = if (rgb) 3 else 1
    if (off + w.toLong * h * bpp > b.length) return null
    if (rgb) (w, h, (x, y) => {
      val p = off + (y * w + x) * 3 // PPM sample order is R,G,B
      (299 * u8(b, p) + 587 * u8(b, p + 1) + 114 * u8(b, p + 2)) / 1000
    })
    else (w, h, (x, y) => u8(b, off + y * w + x))
  }

  /** BMP (BITMAPINFOHEADER, biCompression=0): 32bpp BGRA/BGRX (alpha
    * byte ignored — gray is of the color channels only), 24bpp BGR, or
    * 8bpp (palette index read as gray). Bottom-up rows for positive
    * height, top-down for negative; rows padded to 4 bytes (a no-op at
    * 32bpp). */
  private def parseBmp(b: Array[Byte]): Gray = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = le32(b, 10)
    if (le32(b, 14) < 40) return null // header size
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val bpp = u8(b, 28) | (u8(b, 29) << 8)
    val comp = le32(b, 30)
    if (w <= 0 || hRaw == 0 || comp != 0 ||
      (bpp != 32 && bpp != 24 && bpp != 8)) return null
    val h = math.abs(hRaw)
    val bytesPerPx = bpp / 8
    val rowBytes = ((w.toLong * bytesPerPx + 3) / 4) * 4
    if (dataOff + rowBytes * h > b.length) return null
    val topDown = hRaw < 0
    (w, h, (x, y) => {
      val row = if (topDown) y else h - 1 - y
      val p = (dataOff + row * rowBytes + x.toLong * bytesPerPx).toInt
      if (bpp == 8) u8(b, p)
      else (299 * u8(b, p + 2) + 587 * u8(b, p + 1) + 114 * u8(b, p)) / 1000
    })
  }

  /** 64-bit dHash, or null if the payload is not PGM/BMP (see
    * [[PerceptualHashFns]] for the exact arithmetic). */
  def dHash(b: Array[Byte]): java.lang.Long = {
    if (b == null) return null
    var img = parsePgm(b)
    if (img == null) img = parseBmp(b)
    if (img == null) return null
    val (w, h, gray) = img
    var hash = 0L
    var i = 0
    while (i < 8) {
      val y = i * h / 8
      var j = 0
      while (j < 8) {
        val gl = gray(j * w / 9, y)
        val gr = gray((j + 1) * w / 9, y)
        if (gl < gr) hash |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** 64-bit differential energy fingerprint of WAV PCM-16, or null
    * (see [[PerceptualHashFns]] for the exact arithmetic). */
  def wavFp(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
      b(10) != 'V' || b(11) != 'E') return null
    // chunk walk (the MediaHeader Long-cursor discipline: sizes are u32)
    var i = 12L
    var fmtOk = false
    var dataOff = -1L
    var dataLen = 0L
    while (i + 8 <= b.length) {
      val j = i.toInt
      val size = le32(b, j + 4)
      if (b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' ' &&
        j + 8 + 16 <= b.length) {
        val codec = u8(b, j + 8) | (u8(b, j + 9) << 8)
        val bits = u8(b, j + 22) | (u8(b, j + 23) << 8)
        fmtOk = codec == 1 && bits == 16
      }
      if (b(j) == 'd' && b(j + 1) == 'a' && b(j + 2) == 't' && b(j + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, b.length - dataOff)
      }
      i += 8L + size + (size & 1L)
    }
    if (!fmtOk || dataOff < 0) return null
    val n = (dataLen / 2).toInt // 16-bit samples, interleaved as stored
    if (n < 65) return null
    val off = dataOff.toInt
    var hash = 0L
    var prev = -1L
    var w = 0
    while (w <= 64) {
      val lo = w.toLong * n / 65
      val hi = (w + 1).toLong * n / 65
      var e = 0L
      var k = lo
      while (k < hi) {
        val s = le16s(b, off + 2 * k.toInt)
        e += math.abs(s.toLong)
        k += 1
      }
      if (w > 0 && prev < e) hash |= 1L << (w - 1)
      prev = e
      w += 1
    }
    java.lang.Long.valueOf(hash)
  }
}
