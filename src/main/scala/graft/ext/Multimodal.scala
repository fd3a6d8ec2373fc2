package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  /** Perceptual near-duplicate pairs over an image payload column — the
    * content-level dedup face of the multimodal column (the header
    * sniff routes; THIS collapses re-encodes/minor edits): every
    * payload [[graft.functions.PerceptualHashFns.imageDHash]]-hashes
    * (codec-free PGM/BMP; un-decodable payloads drop — they have no
    * content hash), and pairs within `maxHamming` bits surface via
    * EXACT-MATCH BANDING: the 64-bit hash splits into maxHamming+1
    * bit-bands, and by pigeonhole two hashes within maxHamming share
    * at least one band unchanged — so the band equi-join finds EVERY
    * qualifying pair (recall 1, no LSH luck involved), and the
    * verify stage's popcount keeps exactly those within the bound.
    *
    * Scale shape (the [[Dedup]] candidate discipline): hashes are one
    * map-only projection; the band join shuffles (band, code) keys —
    * slim rows, shuffle_hash-pinned (the banded side hides behind a
    * Generate the estimator cannot size); verify joins hashes back by
    * id and runs `bit_count(xor)` — integer codegen, no vectors, no
    * payloads past the first projection. */
  def perceptualDupPairs(media: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame =
    hashDupPairs(media,
      graft.functions.PerceptualHashFns.imageDHash(col(payloadCol)),
      maxHamming, idCol)

  /** [[perceptualDupPairs]] for the AUDIO hash: pairs of WAV-PCM
    * payloads whose [[graft.functions.PerceptualHashFns.wavEnergyFp]]
    * energy fingerprints sit within `maxHamming` bits — re-encoded or
    * gain-shifted recordings of the same clip collapse here the way
    * re-saved images collapse under dHash. Same pigeonhole-exact
    * banding and dense dual. */
  def audioDupPairs(media: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame =
    hashDupPairs(media,
      graft.functions.PerceptualHashFns.wavEnergyFp(col(payloadCol)),
      maxHamming, idCol)

  /** Shared near-dup-pairs machinery over any 64-bit content hash. */
  private def hashDupPairs(media: DataFrame, hash: Column,
      maxHamming: Int, idCol: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    val nBands = maxHamming + 1
    val hashes0 = media.select(col(idCol).as("id"), hash.as("ph"))
      .filter(col("ph").isNotNull)
    // dense dual (the [[Similarity.annLshPairs]] envelope pattern): while
    // the SOURCE stats fit the dense bound, one broadcast self-join with
    // the popcount filter INSIDE the scan beats the banded chain's four
    // exchanges. The bound is the MEASURED crossover, not a survival
    // limit: at ~3k small payloads dense reads 0.67 s vs banded 1.8 s,
    // at ~29k banded wins 2.2 s vs 4.2 s (sf0.1/sf1, round-15) — 4 MB
    // of source stats ≈ the ~10k-row flip for document-sized payloads.
    // The stat measures PAYLOAD bytes, so it over-counts rows for real
    // media and flips to banded early — the safe direction (banded is
    // never catastrophic; dense past its envelope is quadratic). Past
    // the bound the banded plan runs: never an all-pairs at corpus
    // scale.
    val denseMax = media.sparkSession.conf
      .getOption("spark.graft.multimodal.pairsDenseMaxBytes")
      .map(_.toLong).getOrElse(4L << 20)
    if (media.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(denseMax)) {
      // stream side spread: the |hashes|² loop must use every core even
      // when the source is one small file — the exchange moves slim
      // (id, hash) rows only
      val j = graft.core.Tables.spread(hashes0)
        .select(col("id").as("j"), col("ph").as("pj"))
      return broadcast(hashes0.select(col("id").as("i"), col("ph").as("pi")))
        .join(j, col("i") < col("j") &&
          bit_count(col("pi").bitwiseXOR(col("pj"))) <= maxHamming)
        .select(col("i"), col("j"),
          bit_count(col("pi").bitwiseXOR(col("pj"))).as("hamming"))
    }
    val hashed = graft.core.Caches.persist(hashes0)
    val bandCols = (0 until nBands).map { s =>
      val lo = s * 64 / nBands
      val hi = (s + 1) * 64 / nBands
      val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1L
      struct(lit(s).as("band"),
        shiftrightunsigned(col("ph"), lo).bitwiseAND(lit(mask)).as("code"))
    }
    val banded = hashed.select(col("id"),
      explode(array(bandCols: _*)).as("bc"))
      .select(col("id"), col("bc").getField("band").as("band"),
        col("bc").getField("code").as("code"))
    val cand = banded.select(col("band"), col("code"), col("id").as("i"))
      .join(banded.select(col("band"), col("code"), col("id").as("j"))
        .hint("shuffle_hash"), Seq("band", "code"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
      .distinct()
    cand
      .join(hashed.select(col("id").as("i"), col("ph").as("pi"))
        .hint("shuffle_hash"), Seq("i"))
      .join(hashed.select(col("id").as("j"), col("ph").as("pj"))
        .hint("shuffle_hash"), Seq("j"))
      .withColumn("hamming", bit_count(col("pi").bitwiseXOR(col("pj"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
  }

  /** [[graft.core.KeySets]] kind tag of the image-dHash blocklist. */
  val DHashKind = "image_dhash"

  /** Persist the corpus's image dHashes as a [[graft.core.KeySets]]
    * blocklist — the build side of the perceptual ingest gate (the
    * [[Dedup.fpIndexSave]] pattern at the content-hash level):
    * hash-equality against this set flags a new payload as a
    * perceptual duplicate of something already ingested. */
  def dHashIndexSave(media: DataFrame, path: String,
      payloadCol: String = "payload"): Unit =
    graft.core.KeySets.save(
      media.select(
          graft.functions.PerceptualHashFns.imageDHash(col(payloadCol)).as("ph"))
        .filter(col("ph").isNotNull).distinct(),
      path, DHashKind)

  /** Stateless perceptual-duplicate flag against a [[dHashIndexSave]]
    * blocklist literal — map-only (one codegen hash + one binary
    * search per row), so the SAME code gates a batch frame or any
    * streaming micro-batch. Un-decodable payloads get a null flag
    * (the drop-gates' total-pass convention: only a POSITIVE content
    * match drops). */
  def flagPerceptualDup(media: DataFrame, hashes: Seq[Long],
      payloadCol: String = "payload"): DataFrame = {
    val ph = graft.functions.PerceptualHashFns.imageDHash(col(payloadCol))
    media.withColumn("perceptual_dup",
      when(ph.isNull, lit(null).cast(BooleanType))
        .otherwise(
          if (hashes.isEmpty) lit(false)
          else graft.functions.ArraySets.sortedLongContains(ph, hashes)))
  }

  /** Kind tags of the Bloom perceptual indexes
    * ([[dHashBloomIndexSave]] / [[wavFpBloomIndexSave]]). */
  val DHashBloomKind = "image_dhash_bloom"
  val WavFpBloomKind = "audio_wavfp_bloom"

  /** CORPUS-SCALE faces of the perceptual ingest gates — the
    * [[graft.ext.Dedup.fpBloomIndexSave]] precedent applied to the
    * content-hash blocklists: the sorted literals of
    * [[flagPerceptualDup]]/[[flagAudioDup]] are driver-sized by
    * contract (~10⁷ hashes ≈ 80 MB task rider is the practical
    * ceiling), while a 10⁹-image reference corpus holds up to 10⁹
    * distinct dHashes — an 8 GB literal. A Bloom over the same 64-bit
    * hashes serves that regime (~1.2 GB at 1% fpp per 10⁹ keys),
    * built distributed, probed map-only, ONE probe per row (unlike
    * the banded near-dup face there is no per-band union-bound issue:
    * fpp here IS the per-document false-flag rate). No false
    * negatives: a content copy of an indexed payload always flags.
    * Un-decodable payloads flag null and PASS (total-pass
    * convention); empty-corpus builds flag nothing. */
  def dHashBloomIndexSave(media: DataFrame, path: String,
      fpp: Double = 0.01, payloadCol: String = "payload"): Unit =
    hashBloomSave(media, path, DHashBloomKind,
      graft.functions.PerceptualHashFns.imageDHash(col(payloadCol)), fpp)

  /** [[dHashBloomIndexSave]] for the WAV energy fingerprint. */
  def wavFpBloomIndexSave(media: DataFrame, path: String,
      fpp: Double = 0.01, payloadCol: String = "payload"): Unit =
    hashBloomSave(media, path, WavFpBloomKind,
      graft.functions.PerceptualHashFns.wavEnergyFp(col(payloadCol)), fpp)

  private def hashBloomSave(media: DataFrame, path: String, kind: String,
      hash: Column, fpp: Double): Unit = {
    val keys = media.select(hash.as("ph"))
      .filter(col("ph").isNotNull).distinct()
    val (n, numBits, blob) = graft.ext.Dedup.buildBloomBlob(keys, "ph", fpp)
    import media.sparkSession.implicits._
    Seq((kind, n, numBits, blob))
      .toDF("kind", "n_items", "num_bits", "bloom")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[dHashBloomIndexSave]]/[[wavFpBloomIndexSave]] dump →
    * blob (None for an empty-corpus build). `expectKind` validates the
    * family: an image index can never serve the audio gate. */
  def hashBloomIndexLoad(spark: org.apache.spark.sql.SparkSession,
      path: String, expectKind: String): Option[Array[Byte]] = {
    require(expectKind == DHashBloomKind || expectKind == WavFpBloomKind,
      s"not a perceptual bloom kind: $expectKind")
    val rows = spark.read.parquet(path).collect()
    require(rows.length == 1 && rows(0).getString(0) == expectKind,
      s"index at $path is not a $expectKind dump")
    Option(rows(0).getAs[Array[Byte]]("bloom"))
  }

  /** [[flagPerceptualDup]] against a Bloom blob instead of a sorted
    * literal: one codegen hash + one `might_contain` probe per row. */
  def flagPerceptualDupBloom(media: DataFrame, bloom: Option[Array[Byte]],
      payloadCol: String = "payload"): DataFrame =
    hashBloomFlag(media, bloom,
      graft.functions.PerceptualHashFns.imageDHash(col(payloadCol)),
      "perceptual_dup")

  /** [[flagAudioDup]] against a Bloom blob instead of a sorted literal. */
  def flagAudioDupBloom(media: DataFrame, bloom: Option[Array[Byte]],
      payloadCol: String = "payload"): DataFrame =
    hashBloomFlag(media, bloom,
      graft.functions.PerceptualHashFns.wavEnergyFp(col(payloadCol)),
      "audio_dup")

  private def hashBloomFlag(media: DataFrame, bloom: Option[Array[Byte]],
      hash: Column, flagCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.Bridge
    val hit = bloom match {
      case None => lit(false)
      case Some(b) => Bridge.column(BloomFilterMightContain(
        Bridge.expression(lit(b)), Bridge.expression(hash)))
    }
    media.withColumn(flagCol,
      when(hash.isNull, lit(null).cast(BooleanType)).otherwise(hit))
  }

  /** [[graft.core.KeySets]] kind tag of the WAV energy-fingerprint
    * blocklist. */
  val WavFpKind = "audio_wavfp"

  /** [[dHashIndexSave]] for AUDIO — persist the corpus's WAV energy
    * fingerprints ([[graft.functions.PerceptualHashFns.wavEnergyFp]])
    * as a [[graft.core.KeySets]] blocklist, completing the multimodal
    * ingest family's build-once/serve-many symmetry (round-16: the
    * image face had [[dHashIndexSave]] + `perceptual_dup_gate`, while
    * [[audioDupPairs]] had pairs-level dedup but no gate face):
    * fingerprint equality against this set flags a new payload as a
    * re-encoded or gain-shifted copy of an already-ingested clip. */
  def wavFpIndexSave(media: DataFrame, path: String,
      payloadCol: String = "payload"): Unit =
    graft.core.KeySets.save(
      media.select(
          graft.functions.PerceptualHashFns.wavEnergyFp(col(payloadCol)).as("ph"))
        .filter(col("ph").isNotNull).distinct(),
      path, WavFpKind)

  /** [[flagPerceptualDup]]'s audio dual: stateless content-duplicate
    * flag against a [[wavFpIndexSave]] blocklist literal — map-only
    * (one codegen fingerprint + one binary search per row), identical
    * on a batch frame or any streaming micro-batch. Un-decodable
    * payloads (not RIFF/WAVE PCM-16, or under one energy window) get a
    * null flag — the drop-gates' total-pass convention. */
  def flagAudioDup(media: DataFrame, hashes: Seq[Long],
      payloadCol: String = "payload"): DataFrame = {
    val ph = graft.functions.PerceptualHashFns.wavEnergyFp(col(payloadCol))
    media.withColumn("audio_dup",
      when(ph.isNull, lit(null).cast(BooleanType))
        .otherwise(
          if (hashes.isEmpty) lit(false)
          else graft.functions.ArraySets.sortedLongContains(ph, hashes)))
  }

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
