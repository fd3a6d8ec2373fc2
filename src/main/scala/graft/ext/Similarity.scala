package graft.ext

import graft.functions.ArrayMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Two scoring paths:
  *
  *   - '''Fixed-point exact''' ([[fixedPointVec]] + [[intDot]]): components
  *     are quantized to 16-bit fixed point (floor(x·2¹⁵) — exact, float
  *     widening and the multiply are both lossless in double), so dot
  *     products and squared norms are exact BIGINT folds — associative,
  *     order-independent, and bit-identical in any engine. This is what
  *     makes cosine results oracle-checkable; quantization error on the
  *     *score* is ≤ ~1e-4, and the score itself is the operator's contract.
  *     The pairwise plan keeps ONE ROW PER PAIR (array fold, no dimension
  *     explosion): the per-pair dot is a map-side fold, so a |Q|·|B| scoring
  *     pass shuffles nothing — the query side broadcasts and the base
  *     scans once.
  *   - '''Float fold''' ([[foldCosine]]): same shape, double math — the fast
  *     path for ANN re-ranking where cross-engine bit-equality is not
  *     required.
  *
  * Scale posture: brute-force top-k broadcasts the (small) query set and
  * scans the base once — the canonical "exact kNN at any scale" plan.
  * Pair-explosion forms (near-dup) are quadratic by nature; the LSH-bucketed
  * variant ([[annLshTopK]]) is the scale path, trading recall for a
  * bucket-local search.
  */
object Similarity {

  /** floor(x·2¹⁵) per component as ARRAY<BIGINT> — exact fixed point. */
  def fixedPointVec(vec: Column): Column =
    transform(vec, x => floor(x.cast(DoubleType) * lit(32768.0)).cast(LongType))

  /** Exact integer dot product of two BIGINT arrays (codegen'd primitive
    * loop — see [[graft.functions.ArrayMath]]; |x|≤2¹⁵ over ≤2²⁰ dims
    * cannot overflow). */
  def intDot(a: Column, b: Column): Column = ArrayMath.dotLong(a, b)

  /** Exact cosine for every (query, base) pair: fixed-point arrays built
    * once per row, query side broadcast, per-pair integer dot + norms via
    * codegen'd map-side loops. cosine = dot / (√n2q·√n2b) in double — every
    * step deterministic and engine-portable. Cost is |Q|·|B| loop passes
    * with NO shuffle (the base side is repartitioned so the scoring scan
    * uses every core even when the source is one small file); use for small
    * query sets or verified-exact workloads. */
  def exactCosinePairs(queries: DataFrame, base: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), fixedPointVec(col(vecCol)).as("qx"))
      .withColumn("qn2", intDot(col("qx"), col("qx")))
    val b = graft.core.Tables.spread(base)
      .select(col(idCol).as("vid"), fixedPointVec(col(vecCol)).as("bx"))
      .withColumn("bn2", intDot(col("bx"), col("bx")))
    broadcast(q).crossJoin(b)
      .withColumn("cosine",
        when(col("qn2") === 0 || col("bn2") === 0, lit(0.0)).otherwise(
          intDot(col("qx"), col("bx")).cast(DoubleType) /
            (sqrt(col("qn2").cast(DoubleType)) * sqrt(col("bn2").cast(DoubleType)))))
      .select(col("qid"), col("vid"), col("cosine"))
  }

  /** Brute-force exact top-k neighbors per query (self-match excluded),
    * deterministic tie-break on vid. */
  def bruteForceTopK(queries: DataFrame, base: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    exactCosinePairs(queries, base, idCol, vecCol)
      .filter(col("qid") =!= col("vid"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Single-pass double cosine between two vector columns (fast path, not
    * cross-engine exact): codegen'd three-accumulator loop, bit-identical
    * to the `aggregate(zip_with(...))` fold it replaces. */
  def foldCosine(a: Column, b: Column): Column = ArrayMath.cosine(a, b)

  /** LSH-bucketed approximate top-k: queries and base are bucketed by
    * sign-random-projection codes over `bands` independent codes of
    * `planesPerBand` bits; candidates share any (band, code); exact
    * fold-cosine re-ranks. The ±1 hyperplane coefficients are drawn from a
    * keyed xxhash64 family — deterministic and seedless; they are evaluated
    * ONCE on a `dims × planes` driver-side job and embedded as literals, so
    * the per-row work is a plain multiply-add fold, not hashing. Recall
    * rises with bands, candidate volume with 2^-planesPerBand; the defaults
    * suit weakly-clustered data (recall ≈ 0.5 at cos 0.4) — corpora with
    * real duplicate clusters (cos ≥ 0.8) get recall ≈ 1 from the same
    * settings. */
  def annLshTopK(queries: DataFrame, base: DataFrame, k: Int,
      planesPerBand: Int = 6, bands: Int = 12, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val nPlanes = bands * planesPerBand
    // Same value family as the inline form: ±1 from xxhash64("srp", plane, i)
    // with INT-typed plane and component indices.
    val coefRows = spark.range(nPlanes.toLong)
      .select(col("id").cast(IntegerType).as("p"),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (pmod(xxhash64(lit("srp"), col("p"), i), lit(2)) * 2 - 1).cast(DoubleType)).as("cs"))
      .orderBy(col("p")).collect()
    val coefs: Array[Array[Double]] =
      coefRows.map(_.getSeq[Double](1).toArray)

    def banded(df: DataFrame, id: String, vec: String): DataFrame = {
      val codes = (0 until bands).map { b =>
        val bits = (0 until planesPerBand).map { p =>
          val proj = ArrayMath.dotDouble(col(vec), typedLit(coefs(b * planesPerBand + p)))
          when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
        }
        bits.reduce(_ + _)
      }
      df.select(col(id), col(vec), posexplode(array(codes: _*)).as(Seq("band", "code")))
    }
    val qb = banded(queries, idCol, vecCol)
      .select(col("band"), col("code"), col(idCol).as("qid"), col(vecCol).as("qv"))
    val bb = banded(base, idCol, vecCol)
      .select(col("band"), col("code"), col(idCol).as("vid"), col(vecCol).as("bv"))
    val cand = qb.join(bb, Seq("band", "code"))
      .filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), col("qv"), col("bv"))
      .dropDuplicates("qid", "vid")
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    cand.withColumn("cosine", foldCosine(col("qv"), col("bv")))
      .select(col("qid"), col("vid"), col("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path
    * (coarse quantizer + cell-local search):
    *
    *  1. '''Train''': deterministic one-step Lloyd — initial cells from a
    *     hash of the vector id, centroids = per-cell means computed with
    *     EXACT fixed-point integer sums (order-independent, so the
    *     centroids — and therefore the whole operator — are reproducible
    *     run to run despite float math and shuffle order). Centroids
    *     (nCells × dims, tiny) collect to the driver and embed as literals.
    *  2. '''Assign''': every base vector goes to its max-cosine centroid —
    *     a codegen'd dot per cell, map-only.
    *  3. '''Probe''': each query searches its `nProbe` best cells; exact
    *     cosine re-ranks within the probed cells.
    *
    * Recall depends on how clustered the corpus is; raise `nProbe` toward
    * `nCells` to approach brute force. The scan cost is |B|·nCells dots for
    * assignment plus the probed fraction (≈ nProbe/nCells) of the corpus
    * per query — vs |Q|·|B| for brute force. */
  def ivfTopK(queries: DataFrame, base: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // 1. Train: exact-integer per-cell means via fixed-point dimension sums.
    val fx = graft.core.Tables.spread(base).select(
        pmod(xxhash64(col(idCol), lit("ivf")), lit(nCells)).cast(IntegerType).as("cell"),
        posexplode(fixedPointVec(col(vecCol))).as(Seq("idx", "xi")))
    val centroidRows = fx.groupBy(col("cell"), col("idx"))
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("c"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("s"), col("c")))),
        t => t.getField("s").cast(DoubleType) / t.getField("c").cast(DoubleType)).as("centroid"))
      .orderBy(col("cell")).collect()
    val centroids: Array[Array[Double]] =
      centroidRows.map(_.getSeq[Double](1).toArray)

    // 2/3. Cell scores as one literal-centroid cosine per cell; argmax via
    // sorted (score desc, cell) key array.
    def cellScores(vec: Column): Column = array(centroids.indices.map(c =>
      struct(ArrayMath.cosine(vec, typedLit(centroids(c))).as("s"), lit(c).as("cell"))): _*)
    def topCells(vec: Column, m: Int): Column =
      slice(reverse(array_sort(cellScores(vec))), 1, m)

    val b = graft.core.Tables.spread(base).select(col(idCol).as("vid"), col(vecCol).as("bv"),
      element_at(topCells(col(vecCol), 1), 1).getField("cell").as("cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        explode(topCells(col(vecCol), nProbe)).as("probe"))
      .select(col("qid"), col("qv"), col("probe").getField("cell").as("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    q.join(b, Seq("cell"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cosine", foldCosine(col("qv"), col("bv")))
      .select(col("qid"), col("vid"), col("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
