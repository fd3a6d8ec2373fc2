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
