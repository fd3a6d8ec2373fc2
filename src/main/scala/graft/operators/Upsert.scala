package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert (merge) into a parquet table directory — the APPLY side of
  * change-data capture: [[graft.ext.Diff.snapshotDiff]] classifies a delta,
  * this folds one in. Used standalone (batch merge) and as the
  * `upsert_parquet` spec sink (each micro-batch merges; checkpoint replay
  * after a failure re-merges the same batch, and merge-by-key is
  * idempotent, so the table converges — the at-least-once → effective
  * exactly-once pattern for foreachBatch sinks).
  *
  * Semantics: the incoming delta is first collapsed to ONE row per key —
  * the row with the highest `orderCols` value (descending compare,
  * null-last; ties broken by every remaining column rendered to a stable
  * struct compare is NOT attempted — give `orderCols` a total order, e.g.
  * a change timestamp + sequence id). Existing rows whose key is absent
  * from the delta survive; keyed matches are replaced; new keys append.
  *
  * Scale shape — copy-on-write with partition pruning:
  *   - PARTITIONED table (`partitionBy` non-empty): only the partitions
  *     the delta touches are read (literal `isin` pruning from the
  *     delta's distinct partition values — a driver collect bounded by
  *     partitions-per-batch, not rows) and only those are rewritten,
  *     via dynamic partition overwrite. A 100 TB table with a
  *     date-partitioned delta rewrites gigabytes, not the table.
  *   - UNPARTITIONED table: full rewrite into a temp dir + atomic rename
  *     swap (the small-table mode; a big table should be partitioned).
  * The merge itself is one anti-join on the key — delta-sized hash side,
  * broadcast when small — plus the delta's per-key window.
  */
object Upsert {

  def mergeParquet(spark: SparkSession, delta: DataFrame, path: String,
      keys: Seq[String], orderCols: Seq[String],
      partitionBy: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "upsert needs key columns")
    require(orderCols.nonEmpty,
      "upsert needs order columns (latest-wins needs a total order)")
    // partition columns must be key columns: otherwise an update that moves
    // a key across partitions would leave its old copy stranded in an
    // un-rewritten partition (the pruned merge only rewrites partitions the
    // DELTA touches)
    require(partitionBy.forall(keys.contains),
      s"partition columns must be a subset of the keys: ${partitionBy.mkString(",")}")
    val latest = delta
      .withColumn("__up_rn", row_number().over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(orderCols.map(c => col(c).desc_nulls_last): _*)))
      .filter(col("__up_rn") === 1).drop("__up_rn")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val exists = fs.exists(target)

    def write(df: DataFrame, dest: String): Unit = {
      val w = df.write.format("parquet")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .mode("overwrite").save(dest)
    }

    if (!exists) {
      write(latest, path)
    } else if (partitionBy.nonEmpty) {
      // prune: read ONLY the delta's partitions, then dynamically
      // overwrite exactly those
      val touched = latest.select(partitionBy.map(col): _*).distinct().collect()
      val pruned = touched.toSeq match {
        case Seq() => return // empty delta: nothing to do
        case ts =>
          val old = spark.read.parquet(path)
          val hit = ts.map(r => partitionBy.zipWithIndex
              .map { case (c, i) => col(c) <=> lit(r.get(i)) }.reduce(_ && _))
            .reduce(_ || _)
          old.filter(hit)
      }
      // materialize before the overwrite: Spark (rightly) refuses to
      // overwrite a path its own plan is reading. localCheckpoint holds
      // only delta + touched partitions — bounded by the batch, not the
      // table
      val merged = pruned.join(latest, keys, "left_anti")
        .unionByName(latest.select(pruned.columns.map(col).toIndexedSeq: _*))
        .localCheckpoint(true)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        merged.write.format("parquet").partitionBy(partitionBy: _*)
          .mode("overwrite").save(path)
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    } else {
      val old = spark.read.parquet(path)
      val merged = old.join(latest, keys, "left_anti")
        .unionByName(latest.select(old.columns.map(col).toIndexedSeq: _*))
      val tmp = new org.apache.hadoop.fs.Path(path + s".__up_tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      write(merged, tmp.toString)
      // swap: the rename pair is the non-atomic window (two FS ops); a
      // production table format closes it with a manifest commit — at
      // this layer the checkpoint replay re-runs the merge idempotently
      val bak = new org.apache.hadoop.fs.Path(path + s".__up_old")
      if (fs.exists(bak)) fs.delete(bak, true)
      // Hadoop FS signals rename failure by returning false, not throwing:
      // check each step and never delete the backup until the new data is
      // verifiably in place — otherwise a failed swap could silently no-op
      // or, worse, destroy the only copy of the table.
      if (!fs.rename(target, bak))
        sys.error(s"upsert swap failed: could not move $target aside")
      if (!fs.rename(tmp, target)) {
        fs.rename(bak, target) // best-effort restore of the original table
        sys.error(s"upsert swap failed: could not move $tmp into place")
      }
      if (!fs.exists(target))
        sys.error(s"upsert swap failed: $target missing after rename")
      fs.delete(bak, true)
    }
  }
}
