package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming duals of the warehouse maintenance passes in
  * [[graft.ext.Diff]]: SCD-Type-2 dimension upkeep and distribution-drift
  * monitoring, both as foreachBatch sinks (the pattern the `upsert_parquet`
  * spec sink already uses — each micro-batch folds into a parquet table;
  * checkpoint replay re-runs a batch and the fold is designed to converge).
  *
  * The reference (`/root/reference/`, an 11-operator byte pipe) has no
  * table-versioning or monitoring surface; these extend the batch
  * [[graft.ext.Diff.scd2History]] / [[graft.ext.Diff.columnDrift]]
  * contracts to continuous ingest.
  */
object WarehouseStreams {

  /** Fold ONE micro-batch of change-log rows into an SCD2 dimension table
    * at `path` (schema = [[graft.ext.Diff.scd2History]] output: keys,
    * version, attrs, valid_from, valid_to, is_current).
    *
    * Incremental contract — equals the batch rebuild when event time is
    * monotone per key across batches (the same ordering a watermark
    * enforces): a batch row opens a new version iff its tracked attributes
    * differ null-safely from the previous state (the table's open row for
    * the key's first batch row, the previous batch row after that);
    * consecutive identical states collapse; the superseded open row gets
    * `valid_to` = first opening row's timestamp and `is_current` = 0;
    * version numbers continue from the table's open version.
    *
    * Replay safety: rows with `tsCol` <= the key's current `valid_from`
    * are dropped as already-applied — a checkpoint-replayed batch finds
    * its own rows at-or-before the open row's `valid_from` and no-ops, so
    * at-least-once delivery converges (same posture as
    * [[graft.operators.Upsert.mergeParquet]], which this calls keyed on
    * (keys, version)).
    *
    * Scale shape: only versions the batch CHANGES cross the merge — one
    * window over the batch (batch-sized), one semi-filtered read of the
    * table's open rows, and Upsert's anti-join merge. History rows are
    * immutable and never rewritten logically (the unpartitioned fallback
    * rewrites files; partition a big dimension by a key column so the
    * merge prunes).
    */
  def scd2ApplyBatch(spark: SparkSession, batch: DataFrame, path: String,
      keys: Seq[String], tsCol: String, tieCols: Seq[String],
      attrs: Seq[String], partitionBy: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "scd2Apply needs key columns")
    require(attrs.nonEmpty, "scd2Apply needs tracked attribute columns")
    if (batch.isEmpty) return
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // a pre-created empty table directory is "no table yet", not a table
    val target = new org.apache.hadoop.fs.Path(path)
    val exists = fs.exists(target) && fs.listStatus(target).nonEmpty

    val order = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)

    if (!exists) {
      // first batch: the batch IS the log — write the batch build (through
      // Upsert.createParquet, so an unpartitioned dim is manifest-committed
      // and crash-safe from its very first version)
      val hist = graft.ext.Diff.scd2History(batch, keys, tsCol, tieCols, attrs)
      graft.operators.Upsert.createParquet(spark, hist, path, partitionBy)
      return
    }

    // open row per affected key: prior attrs/version/valid_from, prefixed
    // so batch columns of the same name survive the join
    val dim = graft.operators.Upsert.readTable(spark, path)
    val cur = dim.filter(col("is_current") === 1L)
      .join(batch.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .select(keys.map(col) ++ attrs.map(c => col(c).as(s"__s2p_$c")) ++ Seq(
        col("version").as("__s2p_ver"), col("valid_from").as("__s2p_from")): _*)

    val joined = batch.join(cur, keys, "left")
      // replay / late-data guard: at-or-before the open row's valid_from
      // means already folded (or unrepresentable under monotone time)
      .filter(col("__s2p_from").isNull || col(tsCol) > col("__s2p_from"))
      .withColumn("__s2_rn", row_number().over(w))
    // previous state: the table's open row for the key's first batch row,
    // the previous batch row after that (non-opening rows carry the same
    // attrs as the last opened state, so lag over ALL rows is equivalent —
    // same argument as the batch scd2History collapse)
    val differs = attrs.map { c =>
      val prev = when(col("__s2_rn") === 1, col(s"__s2p_$c")).otherwise(lag(col(c), 1).over(w))
      !(prev <=> col(c))
    }.reduce(_ || _)
    val opens = (col("__s2_rn") === 1 && col("__s2p_ver").isNull) || differs
    val changes = joined.withColumn("__s2_open", opens)
      .filter(col("__s2_open")).drop("__s2_rn", "__s2_open")

    val newRows = changes
      .withColumn("version",
        (coalesce(col("__s2p_ver"), lit(0L)) + row_number().over(w)).cast(LongType))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        when(lead(col(tsCol), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
      .select(keys.map(col) ++ Seq(col("version")) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)

    // close the superseded open row at the first opening row's timestamp
    // (keys new to the table appear in firstOpen but not in cur — the
    // inner join drops them; keys with no opening row never appear)
    val firstOpen = newRows
      .groupBy(keys.map(col): _*).agg(min(col("valid_from")).as("__s2_close"))
    val closed = cur
      .join(firstOpen, keys)
      .select(keys.map(col) ++ Seq(col("__s2p_ver").as("version")) ++
        attrs.map(c => col(s"__s2p_$c").as(c)) ++ Seq(
          col("__s2p_from").as("valid_from"), col("__s2_close").as("valid_to"),
          lit(0L).as("is_current")): _*)

    val delta = closed.unionByName(newRows)
    if (!delta.isEmpty)
      graft.operators.Upsert.mergeParquet(spark, delta, path,
        keys :+ "version", orderCols = Seq("valid_from"), partitionBy = partitionBy)
  }

  /** writeStream sink: continuous SCD2 dimension upkeep from a change-log
    * stream. `stream.writeStream` wiring mirrors the `upsert_parquet` spec
    * sink — pair with a checkpointLocation for recovery. */
  def scd2Sink(stream: DataFrame, path: String, keys: Seq[String],
      tsCol: String, tieCols: Seq[String], attrs: Seq[String],
      partitionBy: Seq[String] = Nil): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
      scd2ApplyBatch(b.sparkSession, b, path, keys, tsCol, tieCols, attrs, partitionBy)
    }

  /** Distribution drift of ONE micro-batch against a fixed baseline
    * histogram: [[graft.ext.Diff.columnDrift]] with the batch as the "new"
    * side, tagged with the micro-batch id — one summary row per batch.
    * `baseline` should be a small pre-aggregated reference snapshot (or
    * the snapshot itself; it is scanned once per batch — persist it). */
  def columnDriftBatch(baseline: DataFrame, batch: DataFrame,
      valueCol: String, batchId: Long): DataFrame =
    graft.ext.Diff.columnDrift(baseline, batch, valueCol)
      .withColumn("batch_id", lit(batchId))
      .select(col("batch_id"), col("n_old"), col("n_new"), col("n_values"),
        col("tvd_num"), col("tvd_fp"))

  /** writeStream sink: per-micro-batch drift monitoring appended to a
    * parquet log at `outPath` — the continuous "did this feed change
    * shape?" check. One appended row per batch; append-only, so replay
    * duplicates a batch's row at worst (monitoring, not bookkeeping). */
  def driftSink(stream: DataFrame, baseline: DataFrame, valueCol: String,
      outPath: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      columnDriftBatch(baseline, b, valueCol, id)
        .write.format("parquet").mode("append").save(outPath)
    }
}
