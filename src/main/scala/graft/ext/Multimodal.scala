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
}
