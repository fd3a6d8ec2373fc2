package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators: fixed-step gap filling with
  * last-observation-carried-forward (LOCF) — the resampling step between
  * raw event streams and models/metrics that expect a regular grid.
  */
object TimeSeries {

  /** Fill a per-key time series onto a fixed `stepMs` grid and
    * forward-fill missing points:
    *
    *   1. each key's grid spans its own [min, max] bucket (an explode of a
    *      per-key `sequence` — distributed, no key ever generates beyond
    *      its span, no driver-side calendar);
    *   2. observed buckets left-join on;
    *   3. missing buckets take the last observed value
    *      (`last(..., ignoreNulls)` over an unbounded-preceding frame —
    *      LOCF); buckets before a key's first observation stay null by
    *      construction (the grid starts at the first observation).
    *
    * Input must already be one row per (key, bucket) — pre-aggregate raw
    * events first (and if the value is a floating sum, floor-scale to
    * integers beforehand so the aggregation is addition-order-proof; see
    * q66/q77). One shuffle for the span aggregate, one for the window; the
    * grid explode is map-side. Output: key, bucket, `v_filled`, `is_gap`
    * (1 for filled buckets). */
  def gapFillLocf(perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, stepMs: Long): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive: $stepMs")
    val grid = perBucket.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), lit(stepMs))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket.select(col(keyCol), col(bucketCol), col(valueCol).as("v")),
        Seq(keyCol, bucketCol), "left")
      .select(col(keyCol), col(bucketCol),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        col("v").isNull.cast(org.apache.spark.sql.types.IntegerType).as("is_gap"))
  }
}
