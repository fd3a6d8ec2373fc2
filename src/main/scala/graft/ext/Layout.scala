package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: how rows are arranged across files so that
  * later scans prune. The reference (`/root/reference/`, a byte-stream
  * processor) has no storage layer at all; at 100 TB the dominant cost of
  * most queries is the scan, and the scan's cost is decided at WRITE
  * time — parquet keeps per-file/rowgroup min/max statistics, so a file
  * whose value ranges are tight gets skipped by predicate pushdown, and a
  * file written in arrival order never is.
  *
  * Z-ordering (bit-interleaving) maps MULTI-column locality onto the ONE
  * sort dimension a range-partitioned write has: rows close in z-value
  * are close in every interleaved column, so min/max ranges stay tight
  * for ALL of them — a plain `sortBy(a, b)` gives tight ranges only
  * for `a`.
  */
object Layout {

  /** The z-value (Morton code) of two non-negative columns: the low
    * `bits` bits of `a` and `b`, interleaved (a even positions, b odd).
    * Pure bit arithmetic — one codegen'd projection, engine-portable
    * (mirrored by [[zorderSqlExpr]]). Callers quantize first (bucket
    * index, `pmod`, or [[Stats.quantileBins]]) so the low bits carry
    * signal; 16+16 interleaved bits fill 32 — far past the file-count
    * resolution any real layout needs. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB spelling of [[zorderKey]] — identical bit tree. */
  def zorderSqlExpr(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Cluster `df` by the z-value of two quantized columns and hand back
    * the frame arranged for writing: `numFiles` range partitions of the
    * z-value, each sorted within. Every output file then covers a tight
    * hyper-rectangle in (a, b) — parquet min/max on BOTH columns prune.
    * (`repartitionByRange` samples the z distribution, so skewed value
    * populations still split evenly — no manual histogram needed.)
    * Call `.write.parquet(...)` on the result; kept separate so tests
    * and callers can inspect the plan. */
  def zorderArrange(df: DataFrame, a: Column, b: Column, numFiles: Int,
      bits: Int = 16): DataFrame =
    df.withColumn("zval", zorderKey(a, b, bits))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
}
