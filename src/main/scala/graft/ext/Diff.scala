package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
