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
  *   - UNPARTITIONED table: MANIFEST-COMMITTED versioned rewrite (the
  *     small-table mode; a big table should be partitioned). The table
  *     root holds versioned data directories plus one `__manifest` file
  *     naming the current version; a merge writes the next version
  *     directory in full, then commits with a SINGLE atomic rename of a
  *     freshly-written manifest over the old one. A crash at ANY point
  *     leaves the manifest naming a complete version — the table can
  *     neither vanish nor go half-written (the flaw of the previous
  *     two-rename directory swap, whose window between "old moved aside"
  *     and "new moved in" had no table at the path at all). Orphan
  *     version directories from crashed merges are skipped by version
  *     numbering and garbage-collected by the next successful commit.
  *     Read the table through [[readTable]] (resolves the manifest;
  *     falls back to a plain parquet directory, so it reads both
  *     layouts). Legacy plain-directory tables are upgraded on their
  *     next merge via the old guarded rename pair — one final exposure
  *     to the old window, after which every commit is the single rename.
  * The merge itself is one anti-join on the key — delta-sized hash side,
  * broadcast when small — plus the delta's per-key window.
  */
object Upsert {

  private val ManifestName = "__manifest"
  private val VersionRe = "^v_(\\d{8})$".r

  private def hadoopFs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Read a [[mergeParquet]] table: manifest layout (crash-safe
    * unpartitioned mode) or plain parquet directory (partitioned /
    * legacy). This is the read API for upsert-maintained tables — a plain
    * `spark.read.parquet(root)` on a manifest table would trip over the
    * version directories. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val fs = hadoopFs(spark, path)
    val mf = new org.apache.hadoop.fs.Path(path, ManifestName)
    if (fs.exists(mf))
      spark.read.parquet(
        new org.apache.hadoop.fs.Path(path, readManifest(fs, mf)).toString)
    else spark.read.parquet(path)
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mf: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(mf)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      val v = new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim
      require(VersionRe.matches(v), s"corrupt manifest $mf: '$v'")
      v
    } finally in.close()
  }

  /** Highest existing version number under the root — INCLUDING orphan
    * directories a crashed merge left behind (their numbers are burned,
    * never reused, so a half-written orphan can never be mistaken for
    * live data by a later commit). */
  private def nextVersionName(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): String = {
    val max = fs.listStatus(root).iterator.map(_.getPath.getName).collect {
      case VersionRe(n) => n.toInt
    }.foldLeft(0)(math.max)
    f"v_${max + 1}%08d"
  }

  /** The COMMIT: write the manifest beside the table and atomically rename
    * it over the previous one (FileContext rename with OVERWRITE — one
    * filesystem operation; posix and HDFS both make it atomic). Everything
    * before this call is invisible to readers; everything after it is the
    * new table. Package-private so the crash test can drive the merge to
    * the instant before/after the commit point. */
  private[operators] def commitManifest(spark: SparkSession, path: String,
      version: String): Unit = {
    val fs = hadoopFs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(root, ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp),
      fc.makeQualified(new org.apache.hadoop.fs.Path(root, ManifestName)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Post-commit GC: drop every version directory except the current one
    * (crashed-merge orphans included). Failure here is harmless — the
    * manifest already committed; the next merge retries the cleanup. */
  private def gcVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, keep: String): Unit =
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (VersionRe.matches(n) && n != keep)
        try fs.delete(st.getPath, true) catch { case _: Throwable => () }
    }

  /** Create (or fully replace) a table at `path` with `df`, in the same
    * layout [[mergeParquet]] maintains: manifest-committed when
    * unpartitioned, plain partitioned directory otherwise. Callers that
    * build a table's first state directly (e.g. the SCD2 sink's first
    * batch) use this so the very first commit is already crash-safe. */
  def createParquet(spark: SparkSession, df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val wr = df.write.format("parquet")
    if (partitionBy.nonEmpty)
      wr.partitionBy(partitionBy: _*).mode("overwrite").save(path)
    else {
      val fs = hadoopFs(spark, path)
      val target = new org.apache.hadoop.fs.Path(path)
      val next =
        if (fs.exists(target)) nextVersionName(fs, target) else "v_00000001"
      wr.mode("overwrite")
        .save(new org.apache.hadoop.fs.Path(target, next).toString)
      commitManifest(spark, path, next)
      gcVersions(fs, target, keep = next)
    }
  }

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
      // fresh table: manifest layout from the start when unpartitioned
      createParquet(spark, latest, path, partitionBy)
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
    } else if (fs.exists(new org.apache.hadoop.fs.Path(target, ManifestName))) {
      // manifest layout: write the next version in full, then the commit
      // is ONE atomic manifest rename — no point of failure loses or
      // hides the table (see class doc)
      val cur = readManifest(fs, new org.apache.hadoop.fs.Path(target, ManifestName))
      val old = spark.read.parquet(new org.apache.hadoop.fs.Path(target, cur).toString)
      val merged = old.join(latest, keys, "left_anti")
        .unionByName(latest.select(old.columns.map(col).toIndexedSeq: _*))
      val next = nextVersionName(fs, target)
      write(merged, new org.apache.hadoop.fs.Path(target, next).toString)
      commitManifest(spark, path, next)
      gcVersions(fs, target, keep = next)
    } else {
      // legacy plain directory: upgrade to the manifest layout. The new
      // root (version dir + manifest) is staged beside the table and
      // swapped in with the old guarded rename pair — the final exposure
      // to the two-rename window; every later merge commits atomically.
      val old = spark.read.parquet(path)
      val merged = old.join(latest, keys, "left_anti")
        .unionByName(latest.select(old.columns.map(col).toIndexedSeq: _*))
      val tmp = new org.apache.hadoop.fs.Path(path + s".__up_tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      val v1 = "v_00000001"
      write(merged, new org.apache.hadoop.fs.Path(tmp, v1).toString)
      commitManifest(spark, tmp.toString, v1)
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
