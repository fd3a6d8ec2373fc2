package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for a training-data pipeline: exact (content
  * fingerprint), exact n-gram Jaccard (inverted-index join), MinHash+LSH
  * (band-bucket candidates, exactly verified), and SimHash (banded Hamming
  * join). All plain DataFrame plans.
  *
  * Scale posture (100 TB):
  *   - nothing here is O(n²): pair generation always goes through an
  *     inverted index (shared shingle / shared LSH band / shared SimHash
  *     band) so cost follows true duplicate density, not the row count;
  *   - [[capDocFreq]] drops shingles present in more than `maxDf` documents
  *     — boilerplate n-grams that would otherwise make the inverted-index
  *     join quadratic on hot keys (the standard near-dup trick);
  *   - SimHash banding is lossless by pigeonhole: hamming ≤ 3 over a 60-bit
  *     signature split into 4 bands forces ≥1 identical band, so the band
  *     join finds every qualifying pair — it is an optimization, never an
  *     approximation;
  *   - MinHash banding IS probabilistic (tunable via hashes/band); the
  *     emitted pairs are exact-Jaccard-verified, so precision is always 1
  *     and band count controls recall only.
  */
object Dedup {

  /** Character n-gram shingle set, one row per distinct (id, shingle).
    * Documents shorter than n contribute their whole text as one shingle. */
  def charShingles(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
        col(idCol).as("id"),
        explode(transform(
          sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1))),
          i => col(textCol).substr(i, lit(n)))).as("sh"))
      .distinct()

  /** Drop shingles occurring in more than `maxDf` documents (anti-hot-key
    * cap for the inverted-index join; see class doc). */
  def capDocFreq(sh: DataFrame, maxDf: Int): DataFrame = {
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    sh.join(dfreq, Seq("sh"))
  }

  /** Exact pairwise Jaccard over shingle sets via inverted-index join:
    * shuffle on shingle (pairs only form where a shingle is shared), then
    * shuffle on (i, j) to count the intersection. Emits (i, j, jaccard)
    * with i < j and jaccard ≥ `minJaccard`. */
  def jaccardPairs(sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("id").as("i"), col("sh"))
      .join(sh.select(col("id").as("j"), col("sh")), Seq("sh"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("n").as("nj")), Seq("j"))
      .withColumn("jaccard",
        col("c").cast(DoubleType) / (col("ni") + col("nj") - col("c")).cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** MinHash signature: numHashes column-wise minima of a keyed xxhash64
    * family over the shingle set. One aggregation with map-side partial
    * minima — the shuffle carries |docs| × numHashes longs, independent of
    * shingle count. */
  def minhashSignature(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(k => min(xxhash64(col("sh"), lit(k))).as(s"m$k"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: signature split into `bands` groups of `rowsPerBand`,
    * each band hashed to one bucket key; docs sharing any (band, bucket)
    * become a candidate pair. */
  def lshCandidates(sig: DataFrame, rowsPerBand: Int, bands: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(k => col(s"m$k")): _*)
    }
    val banded = sig.select(col("id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    banded.select(col("band"), col("bh"), col("id").as("i"))
      .join(banded.select(col("band"), col("bh"), col("id").as("j")), Seq("band", "bh"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, exact-verified: LSH proposes candidates,
    * exact Jaccard over the (capped) shingle sets filters them, so emitted
    * pairs are exactly those with true jaccard ≥ `minJaccard` among the
    * candidates. The candidate set is tiny next to the corpus, so the
    * verification joins broadcast it. */
  def minhashLshPairs(docs: DataFrame, n: Int, maxDf: Int,
      numHashes: Int, rowsPerBand: Int, minJaccard: Double): DataFrame = {
    val sh = capDocFreq(charShingles(docs, n), maxDf)
    val cand = lshCandidates(minhashSignature(sh, numHashes), rowsPerBand, numHashes / rowsPerBand)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = broadcast(cand)
      .join(sh.select(col("id").as("i"), col("sh")), Seq("i"))
      .join(sh.select(col("id").as("j"), col("sh")), Seq("j", "sh"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("n").as("nj")), Seq("j"))
      .withColumn("jaccard",
        col("c").cast(DoubleType) / (col("ni") + col("nj") - col("c")).cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** Weighted SimHash signature (60-bit): shingles weighted by occurrence
    * count; the hash is the first 15 hex digits of md5 — reproducible in
    * any engine, which is what makes the operator oracle-checkable. One
    * aggregation; the shuffle carries 60 partial sums per doc. */
  def simhashSignature(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shw = docs.select(
        col(idCol).as("id"),
        explode(transform(
          sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1))),
          i => col(textCol).substr(i, lit(n)))).as("sh"))
      .groupBy(col("id"), col("sh")).agg(count(lit(1)).as("w"))
      .withColumn("h", conv(substring(md5(col("sh")), 1, 15), 16, 10).cast(LongType))
    val bitSums = (0 until 60).map { b =>
      sum(col("w") * (shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1)).as(s"b$b")
    }
    val agg = shw.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming (< 15-bit band width ×
    * band count guarantee: maxHamming ≤ 3 with 4 bands is lossless). Band
    * join on 15-bit slices, then exact popcount filter. */
  def simhashPairs(docs: DataFrame, n: Int, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignature(docs, n)
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sig"), 15 * k).bitwiseAND(lit(0x7FFFL))): _*)).as(Seq("band", "bh")))
    banded.select(col("band"), col("bh"), col("id").as("i"), col("sig").as("sig_i"))
      .join(banded.select(col("band"), col("bh"), col("id").as("j"), col("sig").as("sig_j")),
        Seq("band", "bh"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("sig_i").bitwiseXOR(col("sig_j"))).cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact dedup by content fingerprint: every row keyed by its md5-derived
    * 60-bit fingerprint, labeled with its group's canonical (minimum) id and
    * copy count. One shuffle on the fingerprint. */
  def exactDedup(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = TextAnalysis.fingerprint(docs, textCol)
      .select(col(idCol), col("fp60"))
    val groups = fp.groupBy(col("fp60"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
    fp.join(groups, Seq("fp60"))
  }
}
