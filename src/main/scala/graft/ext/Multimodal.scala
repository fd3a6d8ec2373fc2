package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque BINARY
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[decodeStub]]) — but
  * everything Spark-cares-about is real and tested: the schema, the binary
  * column handling, the mapPartitions batch shape (one decoder instance per
  * partition, streamed rows — the same lifecycle a JNI/FFI codec needs), and
  * the frame-sampling / feature-extraction operators downstream.
  *
  * Scale posture: payloads never pass through a shuffle wider than needed —
  * decode/feature ops are narrow (mapPartitions), and metadata-only plans
  * prune the payload column at the parquet scan.
  */
object Multimodal {

  /** Canonical media row: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap a text corpus as media rows (UTF-8 payload bytes) — the
    * deterministic stand-in for reading real media files; the binary-column
    * plumbing downstream is identical. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("media_type"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))

  case class DecodedMedia(media_id: Long, width: Int, height: Int,
      n_bytes: Long, mean_byte: Double)

  /** STUB decoder ??? — stands in for an image/audio codec (not present in
    * this container). Deterministic fake: "dimensions" derived from payload
    * length, "pixels" are the raw bytes. Runs one decoder per partition via
    * mapPartitions — the real-codec batch shape (amortized init, streamed
    * rows, no per-row JNI setup). */
  def decodeStub(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site (real codec: allocate decoder context here)
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val w = math.max(1, math.sqrt(n.toDouble).toInt)
          val h = if (w == 0) 0 else n / w
          var s = 0L
          var i = 0
          while (i < n) { s += (bytes(i) & 0xff); i += 1 }
          DecodedMedia(id, w, h, n.toLong, if (n == 0) 0.0 else s.toDouble / n)
        }
      }
  }

  /** Frame sampling: every `stride`-th block of `frameLen` payload bytes,
    * as (media_id, frame_no, frame: BINARY). Pure Column ops — the payload
    * is sliced, never copied through a UDF. */
  def frameSample(media: DataFrame, frameLen: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(((length(col("payload")) - frameLen) / stride).cast(IntegerType), lit(0))),
          i => substring(col("payload"), (i * stride + 1).cast(IntegerType), lit(frameLen))))
          .as(Seq("frame_no", "frame")))

  /** Metadata-only projection — demonstrates payload pruning: this plan's
    * parquet ReadSchema must not contain the payload column. */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"),
      element_at(col("meta"), "lang").as("lang"))

  /** Container-header sniff ([[graft.functions.MediaHeader]]) — the
    * codec-free metadata pass: format id + dimensions / audio params
    * parsed from the payload's first bytes. Map-only; the fields a media
    * crawl filters and routes on before any codec runs. */
  def sniff(media: DataFrame): DataFrame =
    media
      .withColumn("hdr", graft.functions.MediaHeaderFns.mediaHeader(col("payload")))
      .select(col("media_id"), col("hdr.format").as("format"),
        col("hdr.width").as("width"), col("hdr.height").as("height"),
        col("hdr.sample_rate").as("sample_rate"),
        col("hdr.channels").as("channels"),
        col("hdr.duration_ms").as("duration_ms"))

  /** Handcrafted container headers (shared by q109 and the spec tests):
    * real byte layouts, hand-derivable expected values. */
  object SampleHeaders {
    private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

    /** PNG signature + IHDR: 64 × 48. */
    val png: Array[Byte] = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      bytes(0, 0, 0, 0x40, 0, 0, 0, 0x30, 8, 2, 0, 0, 0)

    /** GIF89a logical screen: 320 × 200 (little-endian). */
    val gif: Array[Byte] = "GIF89a".getBytes("US-ASCII") ++
      bytes(0x40, 0x01, 0xC8, 0x00, 0xF7, 0x00, 0x00)

    /** JPEG with a COM segment before SOF0: 640 × 480. */
    val jpeg: Array[Byte] = bytes(0xFF, 0xD8,
      0xFF, 0xFE, 0x00, 0x04, 0x68, 0x69,               // COM "hi"
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, 0x02, 0x80, // SOF0 480×640
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)

    /** WAV header: mono, 8000 Hz, 16-bit, 1500 ms of PCM declared. */
    val wav: Array[Byte] = "RIFF".getBytes("US-ASCII") ++
      bytes(0x24, 0x5E, 0x00, 0x00) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++
      bytes(16, 0, 0, 0,            // fmt chunk size
        0x01, 0x00, 0x01, 0x00,     // PCM, 1 channel
        0x40, 0x1F, 0x00, 0x00,     // 8000 Hz
        0x80, 0x3E, 0x00, 0x00,     // byte rate 16000
        0x02, 0x00, 0x10, 0x00) ++  // block align 2, 16 bits
      "data".getBytes("US-ASCII") ++ bytes(0xC0, 0x5D, 0x00, 0x00) // 24000 bytes
  }
}
