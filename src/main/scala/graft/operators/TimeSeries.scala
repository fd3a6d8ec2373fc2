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
    * q66/q77). Buckets must sit on the `lo + k·stepMs` lattice of their
    * key (true by construction when they come from a truncate-to-step
    * expression); an off-lattice bucket would silently miss the grid join
    * and lose its value, so it RAISES instead (full-outer join + marker —
    * the guard rides the join the fill needs anyway, no extra pass).
    *
    * One shuffle for the span aggregate, one for the window; the grid
    * explode is map-side and CHUNKED — `sequence()` materializes a whole
    * per-row array, so a single span-length sequence would be O(span/step)
    * memory in one row (a 3-year key at 1 s steps is a ~95 M-element
    * array, past sequence()'s own length cap); an outer chunk-index
    * explode bounds every array at `GridChunk` elements. Output: key,
    * bucket, `v_filled`, `is_gap` (1 for filled buckets). */
  private val GridChunk = 4096L
  def gapFillLocf(perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, stepMs: Long): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive: $stepMs")
    val span = stepMs * GridChunk
    val chunks = perBucket.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
      .select(col(keyCol), col("lo"), col("hi"),
        explode(sequence(lit(0L),
          graft.queries.intDiv(col("hi") - col("lo"), span))).as("ci"))
    val grid = chunks.select(col(keyCol),
      explode(sequence(
        col("lo") + col("ci") * lit(span),
        least(col("hi"), col("lo") + (col("ci") + 1) * lit(span) - lit(stepMs)),
        lit(stepMs))).as(bucketCol))
    val joined = grid.withColumn("on_grid", lit(1))
      .join(perBucket.select(col(keyCol), col(bucketCol), col(valueCol).as("v")),
        Seq(keyCol, bucketCol), "full_outer")
    val vType = perBucket.schema(valueCol).dataType
    val guarded = when(col("on_grid").isNull,
      raise_error(concat(lit("gapFillLocf: observed bucket off the lo+k*step lattice: "),
        col(bucketCol))).cast(vType))
      .otherwise(col("v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.withColumn("v", guarded)
      .select(col(keyCol), col(bucketCol),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        col("v").isNull.cast(org.apache.spark.sql.types.IntegerType).as("is_gap"))
  }
}
