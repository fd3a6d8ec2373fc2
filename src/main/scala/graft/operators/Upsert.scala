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
  *     numbering and garbage-collected by the next successful commit,
  *     which RETAINS one complete predecessor version as a concurrent-
  *     reader grace window (see [[gcVersions]]); a torn or lost manifest
  *     self-heals by resolving the highest `_SUCCESS`-complete version
  *     ([[currentVersion]]).
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
        new org.apache.hadoop.fs.Path(path, currentVersion(fs, path)).toString)
    else spark.read.parquet(path)
  }

  /** Manifest contents when readable AND naming an existing version
    * directory; None on missing / torn / stale-target manifests (an empty
    * or garbage file is what ext4 delayed allocation can surface after a
    * power loss that raced the rename). */
  private def readManifestOpt(fs: org.apache.hadoop.fs.FileSystem,
      mf: org.apache.hadoop.fs.Path): Option[String] =
    try {
      if (!fs.exists(mf)) return None
      val in = fs.open(mf)
      try {
        val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        val v = new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim
        if (VersionRe.matches(v) && fs.exists(new org.apache.hadoop.fs.Path(mf.getParent, v)))
          Some(v)
        else None
      } finally in.close()
    } catch {
      // an unreadable manifest (torn write, checksum mismatch on a
      // checksummed FS) is the torn case, not a caller error — fall back
      case scala.util.control.NonFatal(_) => None
    }

  /** Highest version directory whose parquet write COMPLETED (Spark's
    * `_SUCCESS` marker) — the self-heal target when the manifest is
    * unreadable. May sit one version AHEAD of the lost manifest (a crash
    * between the version write and the commit rename): rolling forward to
    * it is safe because the merge is idempotent — re-merging the same
    * delta converges to the same table. */
  private def latestCompleted(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[String] =
    fs.listStatus(root).iterator.map(_.getPath.getName)
      .collect { case n @ VersionRe(_) => n }
      .filter(n => fs.exists(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, n), "_SUCCESS")))
      .toSeq.sorted.lastOption

  /** Resolve the live version: the manifest when intact, else the highest
    * `_SUCCESS`-complete version directory (self-heal — a torn manifest
    * makes the table readable again and the next merge rewrites the
    * manifest as part of its normal commit). Errors only when no complete
    * version exists at all. */
  private[operators] def currentVersion(
      fs: org.apache.hadoop.fs.FileSystem, path: String): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    readManifestOpt(fs, new org.apache.hadoop.fs.Path(root, ManifestName))
      .orElse(latestCompleted(fs, root))
      .getOrElse(sys.error(
        s"unreadable upsert table $path: manifest corrupt/missing and no complete v_* directory"))
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
    try {
      out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // force the bytes to the device BEFORE the rename: without this,
      // ext4 delayed allocation can persist the rename but not the data,
      // surfacing an empty manifest after power loss (hsync where the FS
      // supports it — FSDataOutputStream falls back to flush otherwise,
      // and the _SUCCESS fallback in currentVersion covers that case)
      out.hsync()
    } finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp),
      fc.makeQualified(new org.apache.hadoop.fs.Path(root, ManifestName)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Post-commit GC with ONE version of retention: keep the committed
    * version plus `retain` — the version the OUTGOING manifest named —
    * and drop everything else (crashed-merge orphans included, even
    * complete ones: they were never committed, so no reader can hold
    * them). The retained predecessor is the concurrent-reader grace
    * window: a reader that resolved the manifest an instant before this
    * commit is still scanning the previous version, and deleting it
    * mid-scan would be a FileNotFoundException in that reader. One
    * version of retention covers any reader that started before the
    * commit; a reader outliving a FULL further merge cycle is outside
    * the contract (single writer; readers shorter than the merge
    * cadence). Failure here is harmless — the manifest already
    * committed; the next merge retries the cleanup. */
  private def gcVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, keep: String,
      retain: Option[String] = None): Unit =
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (VersionRe.matches(n) && n != keep && !retain.contains(n))
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
      // the previously committed version (when replacing an existing
      // manifest table) survives one GC cycle as the reader grace window
      val prev =
        if (fs.exists(new org.apache.hadoop.fs.Path(target, ManifestName)))
          readManifestOpt(fs, new org.apache.hadoop.fs.Path(target, ManifestName))
        else None
      val next =
        if (fs.exists(target)) nextVersionName(fs, target) else "v_00000001"
      wr.mode("overwrite")
        .save(new org.apache.hadoop.fs.Path(target, next).toString)
      commitManifest(spark, path, next)
      gcVersions(fs, target, keep = next, retain = prev)
      // legacy-upgrade cleanup: replacing a PLAIN parquet directory leaves
      // its loose data files at the root (gcVersions only sweeps v_*
      // dirs) — without this they double storage forever, and a plain
      // spark.read.parquet(root) would see a conflicting mixed layout.
      // Root-level FILES other than the manifest can only be legacy data
      // (the manifest layout keeps nothing else there).
      fs.listStatus(target).foreach { st =>
        if (st.isFile && st.getPath.getName != ManifestName)
          try fs.delete(st.getPath, false) catch { case _: Throwable => () }
      }
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
      val cur = currentVersion(fs, path)
      val old = spark.read.parquet(new org.apache.hadoop.fs.Path(target, cur).toString)
      val merged = old.join(latest, keys, "left_anti")
        .unionByName(latest.select(old.columns.map(col).toIndexedSeq: _*))
      val next = nextVersionName(fs, target)
      write(merged, new org.apache.hadoop.fs.Path(target, next).toString)
      commitManifest(spark, path, next)
      gcVersions(fs, target, keep = next, retain = Some(cur))
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
