package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for oracle-checked queries.
  *
  * Cross-engine determinism discipline (Spark vs DuckDB hash compare):
  *   - Sums over DOUBLE columns are order-dependent in IEEE float math and a
  *     shuffle reorders partial aggregates, so a raw `sum(double)` is NOT
  *     reproducible bit-for-bit across engines. We cast to DECIMAL first
  *     (exact, associative), sum, then cast the final result back to DOUBLE
  *     (a single deterministic IEEE rounding). The same cast chain appears in
  *     the DuckDB oracle SQL.
  *   - Averages are expressed as decimal-sum / count in DOUBLE, never the
  *     engine-native avg() (Spark's decimal avg and DuckDB's double avg have
  *     different rounding behavior).
  *   - Every query output is given a total order (ORDER BY with a unique
  *     tie-break key) so row order cannot differ.
  */
package object queries {

  /** Exact sum of a 2-decimal-place quantity (e.g. prices), as DOUBLE. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a derived product with up to `s` true decimal places.
    * The per-row product is computed in DOUBLE (deterministic per row: same
    * IEEE ops in both engines), then cast to decimal with 2 digits of scale
    * headroom beyond the true decimal precision, so double representation
    * error (~1e-13 relative) can never straddle a rounding boundary.
    */
  def dsumN(c: Column, s: Int): Column = sum(c.cast(DecimalType(27, s))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count, in DOUBLE. */
  def davg2(c: Column): Column = (dsum2(c) / count(lit(1))).cast(DoubleType)

  /** TRUE integer division (Column./ on longs is a double divide, whose
    * floor drifts from the integer rule past 2⁵³ — a bug class this repo
    * has already hit). Matches DuckDB's `//` including truncation
    * direction. */
  def intDiv(x: Column, d: Long): Column =
    call_function("div", x, lit(d)).cast(LongType)
}
