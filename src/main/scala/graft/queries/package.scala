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

  /** Exact sum of a 2-decimal-place quantity (e.g. prices), as DOUBLE.
    * Cross-engine safe while the sum stays under ~9e13 (unscaled < 2^53;
    * see [[dsumN]]) — true for every price/quantity column through sf100. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a derived product with up to `s` true decimal places.
    * The per-row product is computed in DOUBLE (deterministic per row: same
    * IEEE ops in both engines), then cast to decimal with 2 digits of scale
    * headroom beyond the true decimal precision, so double representation
    * error (~1e-13 relative) can never straddle a rounding boundary.
    *
    * The exact decimal sum is re-rounded to 2 decimal places BEFORE the final
    * double cast. A decimal at scale s keeps its unscaled long ~10^s larger;
    * at s=8 a ~3e9 sum has an unscaled value past 2^53, where DuckDB's
    * decimal→double path (unscaled→double, then scale — two roundings) can
    * land 1 ULP away from Spark's correctly-rounded BigDecimal.doubleValue
    * (observed on q01 sum_charge at sf0.1). At scale 2 the unscaled value is
    * exact in double up to ~9e13 (= 2^53/100), so both engines perform one
    * correctly-rounded conversion and agree bit-for-bit. The oracle SQL
    * mirrors the re-round as `round(sum(...), 2)` — DuckDB's round() is
    * half-away-from-zero, matching Spark's HALF_UP decimal cast, whereas
    * DuckDB's decimal→decimal CAST is half-EVEN and would disagree on
    * exact .xx5 ties (probed on duckdb directly).
    */
  def dsumN(c: Column, s: Int): Column =
    sum(c.cast(DecimalType(27, s))).cast(DecimalType(30, 2)).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count, in DOUBLE. */
  def davg2(c: Column): Column = (dsum2(c) / count(lit(1))).cast(DoubleType)

  /** TRUE integer division (Column./ on longs is a double divide, whose
    * floor drifts from the integer rule past 2⁵³ — a bug class this repo
    * has already hit). Matches DuckDB's `//` including truncation
    * direction. */
  def intDiv(x: Column, d: Long): Column =
    call_function("div", x, lit(d)).cast(LongType)
}
