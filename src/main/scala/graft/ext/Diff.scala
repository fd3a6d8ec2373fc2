package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot comparison — the change-data pass between two versions of a
  * keyed table (yesterday's crawl vs today's, pre- vs post-migration):
  * which keys appeared, disappeared, or changed in the compared columns.
  * The reference (`/root/reference/`, a stream processor) has no
  * table-versioning surface; this is the batch complement of the
  * streaming dedup/upsert family.
  *
  * Scale shape: ONE full-outer shuffle join on the key columns — both
  * snapshots partition by the same key, no broadcast of either side
  * (snapshots are corpus-sized), no driver materialization. Null-safe
  * comparison (`<=>`) so a null→value transition counts as a change, not
  * a false equality.
  */
object Diff {

  /** Classify every key across two snapshots: `added` (new only),
    * `removed` (old only), `changed` (both, some compared column
    * differs), `unchanged`. Returns key columns + `change_type` +
    * `old_<c>`/`new_<c>` for each compared column. Filter
    * `change_type != 'unchanged'` for the delta. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs key columns")
    require(compare.nonEmpty, "snapshotDiff needs compare columns")
    require(keys.intersect(compare).isEmpty,
      s"columns cannot be both key and compared: ${keys.intersect(compare).mkString(", ")}")
    val o = oldDf.select((keys ++ compare).map(col): _*)
      .withColumn("__d_old", lit(1))
    val n = newDf.select((keys ++ compare).map(c =>
        col(c).as(if (keys.contains(c)) c else s"__n_$c")) :+ lit(1).as("__d_new"): _*)
    val joined = o.join(n, keys, "full_outer")
    val differs: Column = compare.map(c => !(col(c) <=> col(s"__n_$c")))
      .reduce(_ || _)
    val out = joined.withColumn("change_type",
      when(col("__d_old").isNull, lit("added"))
        .when(col("__d_new").isNull, lit("removed"))
        .when(differs, lit("changed"))
        .otherwise(lit("unchanged")))
    val cols = keys.map(col) ++ Seq(col("change_type")) ++
      compare.flatMap(c => Seq(col(c).as(s"old_$c"), col(s"__n_$c").as(s"new_$c")))
    out.select(cols: _*)
  }

  /** SCD-Type-2 history build — collapse a keyed change LOG into validity
    * intervals: one row per (key, attribute state), `valid_from` =
    * timestamp of the first log row carrying that state, `valid_to` =
    * timestamp of the next state change (null while current),
    * `version` = 1-based change ordinal, `is_current` flag. The warehouse
    * dual of [[snapshotDiff]]: diff compares two snapshots, this folds the
    * full log into the dimension table an as-of join
    * ([[graft.operators.AsofJoin]]) probes.
    *
    * Semantics: rows are ordered per key by (`tsCol`, `tieCols`…) — the
    * tie-break makes the order total, so the result is deterministic under
    * any partitioning. A row opens a new version iff it is the key's first
    * row or ANY tracked attribute differs null-safely from the previous
    * row (null→value and value→null are changes; consecutive identical
    * states collapse into one interval).
    *
    * Scale shape: ONE shuffle on the key columns. Both window passes (the
    * change filter, then version/lead over the surviving change rows) use
    * the same partitioning and ordering, and a filter preserves both, so
    * the second window reuses the first's exchange and sort. */
  def scd2History(log: DataFrame, keys: Seq[String], tsCol: String,
      tieCols: Seq[String], attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "scd2History needs key columns")
    require(attrs.nonEmpty, "scd2History needs tracked attribute columns")
    val order = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val opens: Column = attrs.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val changes = log
      .withColumn("__s2_rn", row_number().over(w))
      // window expressions must be projected before they can gate a filter
      .withColumn("__s2_open", opens)
      // lag() over an all-null first row null-safe-EQUALS a first state of
      // null, so rn=1 must be kept explicitly, not via the compare
      .filter(col("__s2_rn") === 1 || col("__s2_open"))
      .drop("__s2_rn", "__s2_open")
    changes
      .withColumn("version", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        when(lead(col(tsCol), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
      .select((keys.map(col) :+ col("version")) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Distribution DRIFT of one integral column between two snapshots —
    * the monitoring pass behind "did this feed change shape?": exact
    * per-value histograms of both sides, total-variation distance
    * between them (the same log-free statistic as
    * [[TextAnalysis.sourceDivergence]]; 0 = identical distribution,
    * 10⁶ = disjoint supports), plus the per-value contribution table for
    * drill-down. Returns ONE summary row: n_old, n_new, n_values,
    * tvd_num (exact integer Σ|c_old·N_new − c_new·N_old|) and fixed-point
    * tvd_fp.
    *
    * Scale shape: two histogram aggregates (|distinct values| rows), one
    * full-outer value join of the HISTOGRAMS, one 1-row aggregate — the
    * snapshots themselves are scanned once each and never joined. */
  def columnDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String): DataFrame = {
    def hist(df: DataFrame, cnt: String) = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__d_v")).agg(count(lit(1)).as(cnt))
    val j = hist(oldDf, "c_old").join(hist(newDf, "c_new"), Seq("__d_v"), "full_outer")
      .select(col("__d_v"), coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
    val totals = j.agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"),
      count(lit(1)).as("n_values"))
    // the numerator runs in decimal38 (HUGEINT in the oracle): exact past
    // the ~3·10⁹-row point where BIGINT products would wrap. tvd_fp
    // divides the DECIMAL (always exact, lands in [0, 10⁶]); tvd_num is
    // cast to BIGINT last, for drill-down at scales where it fits.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val lt = org.apache.spark.sql.types.LongType
    val dt = org.apache.spark.sql.types.DoubleType
    j.crossJoin(broadcast(totals))
      .agg(max(col("n_old")).as("n_old"), max(col("n_new")).as("n_new"),
        max(col("n_values")).as("n_values"),
        sum(abs(col("c_old").cast(dec) * col("n_new") -
          col("c_new").cast(dec) * col("n_old"))).as("__num_dec"))
      .withColumn("tvd_fp",
        floor(col("__num_dec").cast(dt) * lit(1000000.0) /
          (lit(2.0) * col("n_old").cast(dt) * col("n_new").cast(dt))).cast(lt))
      .select(col("n_old"), col("n_new"), col("n_values"),
        col("__num_dec").cast(lt).as("tvd_num"), col("tvd_fp"))
  }
}
