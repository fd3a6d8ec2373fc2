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

  /** Small-files compaction — rewrite a parquet directory into files of
    * roughly `targetBytes` each. Streaming ingest (micro-batch sinks, the
    * `upsert_parquet` merges, per-executor writers) accretes thousands of
    * KB-sized files; at 100 TB the NameNode/listing pressure and
    * per-file open cost of a scan then dominate I/O, and compaction is
    * the standard maintenance pass every table format schedules.
    *
    * The partition count comes from the directory's actual byte size
    * (`ceil(bytes / targetBytes)`, floor 1) — a LISTING, not a scan.
    * `coalesce` merges read splits without a shuffle (compaction is
    * I/O-bound; a shuffle would double the data movement). The rewrite
    * lands in a temp dir and swaps in via the same rename pair as
    * [[graft.operators.Upsert]] — readers race only with the final two
    * renames. Returns the new file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val bytes = fs.getContentSummary(target).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(path).coalesce(n).write.parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + ".__compact_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    // rename returns false on failure (no exception): verify each step and
    // keep the backup until the compacted data is in place, so a failed
    // swap never drops the table (same contract as Upsert.mergeParquet)
    if (!fs.rename(target, bak))
      sys.error(s"compaction swap failed: could not move $target aside")
    if (!fs.rename(tmp, target)) {
      fs.rename(bak, target) // best-effort restore
      sys.error(s"compaction swap failed: could not move $tmp into place")
    }
    if (!fs.exists(target))
      sys.error(s"compaction swap failed: $target missing after rename")
    fs.delete(bak, true)
    n
  }
}
