package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap self-join — the "which activities ran concurrently"
  * operator (session concurrency, meeting conflicts, shipment overlap).
  * The reference (`/root/reference/`, a record-at-a-time stream processor)
  * has no join surface at all; this is the interval complement of the
  * point-in-time family ([[AsofJoin]], the q21 range join).
  *
  * Scale design — the grid-bucket trick. A naive per-key self-join
  * compares every pair within a key: O(k²) per key, and a single hot key
  * serializes one executor at 100 TB. Instead each interval [s, e]
  * explodes onto the fixed grid of `bucketWidth`-sized cells it touches,
  * the join runs on (key, cell) — so comparisons happen only between
  * intervals that are close in TIME, not merely same-keyed — and each
  * qualifying pair is emitted by EXACTLY ONE cell: the cell containing
  * max(a.s, b.s). Two overlapping intervals both touch that cell (it lies
  * inside both), so no pair is missed, and no dedup shuffle is needed.
  * Cost: |rows| × (span/bucketWidth + 1) exploded rows and pair tests
  * bounded by temporal density, not key cardinality. Pick `bucketWidth`
  * near the TYPICAL interval span: much smaller multiplies the explode
  * factor, much larger degrades toward the per-key cross product.
  *
  * Both join inputs are the same exploded subtree, so Spark's
  * ReuseExchange turns the self-join's two shuffles into one physical
  * exchange read twice.
  */
object IntervalJoin {

  /** Floor division that matches mathematical floor for ANY sign (Spark's
    * `div` truncates toward zero): (x − (x mod⁺ w)) / w with a
    * nonnegative modulus. Exact long arithmetic throughout. */
  private def floorDiv(x: Column, w: Long): Column =
    // x − pmod is an exact multiple of w, so truncating `div` IS floor
    // here; Column./ would be a double divide (drifts past 2⁵³)
    call_function("div", x - pmod(x, lit(w)), lit(w)).cast(org.apache.spark.sql.types.LongType)

  /** All pairs (a, b) with `a.idCol < b.idCol`, equal `keyCol`, and
    * CLOSED-interval overlap `a.s ≤ b.e ∧ b.s ≤ a.e`, each pair exactly
    * once. Interval columns are integral (e.g. epoch micros); `endCol`
    * must be ≥ `startCol` (rows violating that are dropped — a negative
    * span has no overlap semantics). Output: key, a/b ids, both
    * intervals, and the exact overlap length
    * `min(a.e, b.e) − max(a.s, b.s)`. */
  def overlapPairs(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, bucketWidth: Long,
      maxCellsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxCellsPerInterval > 0, s"maxCellsPerInterval must be positive")
    val iv = df
      .filter(col(keyCol).isNotNull && col(idCol).isNotNull &&
        col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .select(col(keyCol).as("__iv_key"), col(idCol).as("__iv_id"),
        col(startCol).cast("long").as("__iv_s"), col(endCol).cast("long").as("__iv_e"))
    // fail FAST on a mis-sized grid: one runaway interval (or a bucketWidth
    // orders of magnitude below the span scale) would otherwise explode
    // into billions of cells and OOM an executor mid-shuffle — at 100 TB
    // that failure arrives hours in; the per-row assert costs one compare
    val lo = floorDiv(col("__iv_s"), bucketWidth)
    val hi = floorDiv(col("__iv_e"), bucketWidth)
    // assert_true yields NULL on success, so routing `hi` through it keeps
    // the check inside the evaluated expression tree (a standalone guard
    // column would be pruned as unused)
    val hiGuarded = when(
      assert_true(hi - lo < lit(maxCellsPerInterval),
        concat(lit(s"interval spans >= $maxCellsPerInterval grid cells " +
          s"(bucketWidth=$bucketWidth too small for id="), col("__iv_id"),
          lit(")"))).isNull,
      hi)
    val cells = iv.withColumn("__iv_cell", explode(sequence(lo, hiGuarded)))
    val a = cells.select(col("__iv_key"), col("__iv_cell"),
      col("__iv_id").as("a_id"), col("__iv_s").as("a_s"), col("__iv_e").as("a_e"))
    val b = cells.select(col("__iv_key"), col("__iv_cell"),
      col("__iv_id").as("b_id"), col("__iv_s").as("b_s"), col("__iv_e").as("b_e"))
    a.join(b,
        a("__iv_key") === b("__iv_key") && a("__iv_cell") === b("__iv_cell") &&
          col("a_id") < col("b_id") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
          // exactly-once: only the cell holding the later start emits
          a("__iv_cell") === floorDiv(greatest(col("a_s"), col("b_s")), bucketWidth))
      .select(a("__iv_key").as(keyCol), col("a_id"), col("b_id"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_len"))
  }
}
