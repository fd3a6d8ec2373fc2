package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT order statistics — the corpus/feature profiling ops a
  * pipeline runs before choosing filter thresholds (e.g. the length cutoffs
  * behind [[TextAnalysis.lengthOutliers]], price/quality bands, token-count
  * budgets).
  *
  * Scale design (the same shape as [[TextAnalysis.lengthOutliers]]): every
  * op aggregates to a per-(group, value) HISTOGRAM first — the result is
  * |groups| × |distinct values| rows, orders of magnitude smaller than the
  * input — and runs its window arithmetic over THAT. A per-group
  * `percentile()`/sort-based exact percentile buffers or serializes whole
  * groups per executor at 100 TB; a cumulative count over the histogram
  * never does. Exactness: ranks are integers, rank selection is integer
  * comparison, and the only floating steps (the even-median halving, the
  * rank-from-fraction product) are single fixed-association IEEE ops that
  * independent engines reproduce bit-for-bit — unlike interpolating
  * percentile built-ins, whose association order differs per engine.
  */
object Stats {

  /** Exact per-group median and discrete percentiles over an integral value
    * column, via histogram + cumulative rank:
    *
    *   - `n` — non-null value count;
    *   - `median` — value at rank ⌈(n+1)/2⌉ averaged with rank ⌈(n+2)/2⌉
    *     (equal for odd n; the classic two-middle average for even n —
    *     ONE division, bit-stable across engines);
    *   - one `p<P>` column per requested fraction: the DISCRETE percentile,
    *     i.e. the smallest value whose cumulative count reaches
    *     ⌈p·n⌉ — always an actual data value, no interpolation.
    *
    * A rank r is covered by exactly one histogram row (the one with
    * cum − cnt < r ≤ cum), so rank selection is a filter + max per group —
    * no second sort, no join. Two shuffles total: the histogram groupBy and
    * the per-group window over the (small) histogram. */
  def groupedPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      discPs: Seq[Double] = Seq(0.9)): DataFrame = {
    require(discPs.forall(p => p > 0 && p <= 1), s"fractions in (0,1]: $discPs")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // value at integer rank r: the single histogram row whose span covers r
    def at(r: org.apache.spark.sql.Column) =
      max(when(col("cum") - col("cnt") < r && r <= col("cum"), col("v")))
    val m1 = graft.queries.intDiv(col("n") + 1, 2)
    val m2 = graft.queries.intDiv(col("n") + 2, 2)
    val labels = discPs.map(p => s"p${math.round(p * 100)}")
    require(labels.distinct.size == labels.size,
      s"percentile labels collide (fractions closer than 1%): $discPs -> $labels")
    val pAggs = discPs.zip(labels).map { case (p, label) =>
      // ⌈p·n⌉ via the double product both engines compute identically;
      // the label is the whole-percent name (0.9 → p90)
      at(ceil(lit(p) * col("n")).cast(LongType)).as(label)
    }
    val aggs = Seq(max(col("n")).as("n"),
      ((at(m1) + at(m2)).cast(DoubleType) / lit(2.0)).as("median")) ++ pAggs
    cum.groupBy(col("g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact quantile binning — assigns every row the bucket `ntile(k)`
    * would under the total order (value, idCols…), WITHOUT a global sort:
    *
    *  1. histogram: per-distinct-value counts (|distinct values| rows —
    *     orders of magnitude below row count for any binnable feature);
    *  2. cumulative counts + grand total over the histogram (a window over
    *     the SMALL table; its single global ordering pass touches only
    *     distinct values, never rows);
    *  3. each row's exact 1-based rank = (cumulative below its value) +
    *     (row_number within its value group, ordered by `idCols`) — the
    *     within-value window shuffles rows ONCE on the value key, and each
    *     value group sorts independently;
    *  4. ntile arithmetic on the rank, pure integers: with q = n div k and
    *     m = n mod k, the first m buckets take q+1 rows. Bit-exact against
    *     any engine's ntile under the same total order.
    *
    * The classic `ntile() OVER (ORDER BY …)` plans a SINGLE-partition
    * window over the whole corpus — the textbook 100 TB non-starter this
    * op exists to replace. */
  def quantileBins(df: DataFrame, valueCol: String, k: Int,
      idCols: Seq[String]): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(idCols.nonEmpty, "idCols must give rows a total order within a value")
    // internal names prefixed so an input column named "v"/"n"/"r" can
    // never collide with the histogram join
    val rows = df.filter(col(valueCol).isNotNull)
    val hist = rows.groupBy(col(valueCol).as("__qb_v")).agg(count(lit(1)).as("__qb_cnt"))
    val cum = hist.select(col("__qb_v"),
      (sum(col("__qb_cnt")).over(Window.orderBy(col("__qb_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("__qb_cnt")).as("__qb_below"),
      sum(col("__qb_cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("__qb_n"))
    val withinW = Window.partitionBy(col(valueCol)).orderBy(idCols.map(col): _*)
    val ranked = rows.withColumn("__qb_rn", row_number().over(withinW).cast(LongType))
      .join(cum, col(valueCol) === col("__qb_v"))
      .withColumn("__qb_r", col("__qb_below") + col("__qb_rn"))
    val q = graft.queries.intDiv(col("__qb_n"), k)
    val m = col("__qb_n") - q * k
    // first m buckets have q+1 rows, the rest q:
    //   r ≤ m(q+1)         → 1 + (r−1) div (q+1)
    //   otherwise          → 1 + m + (r − m(q+1) − 1) div q
    val r = col("__qb_r")
    val inHead = r <= m * (q + lit(1L))
    val headBucket = lit(1L) + call_function("div", r - 1, q + lit(1L)).cast(LongType)
    val tailBucket = lit(1L) + m +
      call_function("div", r - m * (q + lit(1L)) - 1, q).cast(LongType)
    ranked
      .withColumn("bucket", when(inHead, headBucket).otherwise(tailBucket))
      .drop("__qb_v", "__qb_below", "__qb_n", "__qb_rn", "__qb_r")
  }

  /** One-pass column profiling — the "what is in this table" report run
    * before any schema-dependent pipeline stage (null-rate gates, key
    * candidate detection, bounds for [[histogram]]/[[quantileBins]]).
    * One row per profiled column: row count, non-null count, exact
    * distinct count, min and max (computed in the column's NATIVE type,
    * then rendered to string — so numeric columns order numerically, not
    * lexicographically).
    *
    * Scale shape: ONE aggregate pass over the table produces every
    * column's stats as a single wide row (Spark plans the multi-column
    * distinct via Expand — cost |cols| × rows map-side, one shuffle),
    * which then explodes driver-free into the per-column report. The
    * alternative — one scan per column — pays |cols| full scans. */
  def profile(df: DataFrame, cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { case (n, c) => Seq(
      count(c).as(s"__pf_nn_$n"), countDistinct(c).as(s"__pf_nd_$n"),
      min(c).cast(StringType).as(s"__pf_mn_$n"),
      max(c).cast(StringType).as(s"__pf_mx_$n")) }
    val wide = df.agg(count(lit(1)).as("__pf_rows"), aggs: _*)
    wide.select(explode(array(cols.map { case (n, _) =>
      struct(lit(n).as("column_name"), col("__pf_rows").as("n_rows"),
        col(s"__pf_nn_$n").as("n_nonnull"), col(s"__pf_nd_$n").as("n_distinct"),
        col(s"__pf_mn_$n").as("min_str"), col(s"__pf_mx_$n").as("max_str"))
    }: _*)).as("p")).select(col("p.*"))
  }

  /** Rolling-window anomaly flags over an INTEGRAL value column — the
    * outlier pass of metric/price/length monitoring, decided entirely in
    * integer arithmetic so flags are engine-reproducible (a float z-score
    * flips near the boundary between engines):
    *
    *   flag ⇔ n ≥ minN  ∧  (v·n − Σ)² > k²·(n·Σv² − Σ²)
    *
    * which is |v − mean| > k·σ with both sides multiplied through by n²
    * — every term an exact BIGINT. Integer envelope: the deviation
    * square needs `(|v| · (lookback+1))² < 2⁶³`, i.e. |v| · window
    * below ~3·10⁹ — generous for scaled metrics (cents, token counts);
    * rescale the value column if its magnitude approaches that.
    * The window is the `lookback` rows
    * STRICTLY BEFORE the current one: a value must not dilute its own
    * baseline (with the current row included, a lone spike in an
    * n-row window is capped at z = (n−1)/√n — below 2σ for any n ≤ 5,
    * so small windows could never flag anything). `minN` refuses to
    * judge against fewer than that many context rows (the first rows of
    * every key). One window shuffle on the key, no global pass. */
  def rollingAnomaly(df: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, lookback: Int = 6, k: Int = 2, minN: Int = 3): DataFrame = {
    require(lookback >= 1, s"lookback must be positive: $lookback")
    require(k >= 1, s"k must be positive: $k")
    require(minN >= 1, s"minN must be positive: $minN")
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    val out = df
      .withColumn("win_n", count(v).over(w))
      .withColumn("win_sum", sum(v).over(w))
      .withColumn("win_sum2", sum(v * v).over(w))
    val dev = v * col("win_n") - col("win_sum")
    val spread = col("win_n") * col("win_sum2") - col("win_sum") * col("win_sum")
    out.withColumn("is_anomaly",
      when(col("win_n") >= minN && dev * dev > lit(k.toLong * k) * spread, lit(1L))
        .otherwise(lit(0L)))
  }

  /** One-row key-skew report for a prospective shuffle/join key — the
    * diagnosis behind salting decisions ([[graft.operators.Skew]]) and
    * partition-count choices: distinct keys, total rows, min/max/median/
    * p99 per-key counts, and the hottest key. Composes the
    * [[groupedPercentiles]] histogram machinery over the per-key count
    * table (|keys| rows — never a second corpus pass). */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__ks_k")).agg(count(lit(1)).as("cnt"))
    val basic = counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      min(col("cnt")).as("min_cnt"), max(col("cnt")).as("max_cnt"))
    val pcts = groupedPercentiles(counts.withColumn("__g", lit(1)), "__g", "cnt",
        discPs = Seq(0.99))
      .select(col("median").as("median_cnt"), col("p99").as("p99_cnt"))
    val top = counts.orderBy(col("cnt").desc, col("__ks_k")).limit(1)
      .select(col("__ks_k").cast(StringType).as("top_key"), col("cnt").as("top_cnt"))
    // LEFT joins on true, not crossJoins: with zero non-null keys the
    // percentile/top frames are EMPTY, and a crossJoin would annihilate
    // the (n_keys=0) report row callers rely on receiving
    basic.join(broadcast(pcts), lit(true), "left")
      .join(broadcast(top), lit(true), "left")
  }

  /** Winsorization — clip an integral value column to its own per-group
    * EXACT discrete percentile band [p_lo, p_hi] (the robust-scaling prep
    * for length/score features before they feed thresholds or models;
    * clipping beats dropping when row totality matters). Composes
    * [[groupedPercentiles]]: the bounds come from the histogram machinery
    * (never a per-group sort), the percentile table is |groups| rows and
    * broadcasts back onto the rows — the row table is scanned twice
    * (histogram + clip pass) but never shuffled on the group key.
    * Output adds `w_lo`, `w_hi`, `clipped`, `is_clipped` (0/1). Null
    * values pass through unclipped with `is_clipped` null. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo < pHi, s"pLo must be below pHi: $pLo vs $pHi")
    def label(p: Double) = s"p${math.round(p * 100)}"
    val bounds = groupedPercentiles(df, groupCol, valueCol, Seq(pLo, pHi))
      .select(col(groupCol), col(label(pLo)).as("w_lo"), col(label(pHi)).as("w_hi"))
    val v = col(valueCol)
    // missing bounds (a group whose values were all null never gets a
    // percentile row) behave like a null value: null clipped, null flag —
    // never an inconsistent (clipped=null, is_clipped=0) row
    val noBounds = col("w_lo").isNull || col("w_hi").isNull
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn("clipped",
        when(v.isNull || noBounds, lit(null))
          .otherwise(least(greatest(v, col("w_lo")), col("w_hi"))))
      .withColumn("is_clipped",
        when(v.isNull || noBounds, lit(null).cast(LongType))
          .when(v < col("w_lo") || v > col("w_hi"), lit(1L)).otherwise(lit(0L)))
  }

  /** Fixed-width histogram over a numeric column: bucket index
    * ⌊(v − lo) / width⌋ (one IEEE subtraction + division + floor —
    * identical in any engine), per-bucket count and exact min/max.
    * One shuffle; bucket count is data-range / width, independent of
    * row count. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, width: Double): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor((col(valueCol) - lit(lo)) / lit(width)).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(valueCol)).as("v_min"), max(col(valueCol)).as("v_max"))
  }
}
