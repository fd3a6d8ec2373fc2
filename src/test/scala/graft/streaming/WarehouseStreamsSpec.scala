package graft.streaming

import graft.SparkSpec
import graft.ext.Diff
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import java.sql.Timestamp

/** Streaming duals of the warehouse maintenance passes: SCD2 dimension
  * upkeep and drift monitoring as foreachBatch sinks, driven through
  * MemoryStream micro-batches. Gate: the incremental fold equals the batch
  * rebuild on the same log. */
class WarehouseStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$prefix").toString

  type LogRow = (Long, Timestamp, String, String)
  private val keys = Seq("cust_id")
  private val attrs = Seq("segment", "country")

  // batch 1: key 1 opens then repeats (collapse), key 2 opens
  private val b1: Seq[LogRow] = Seq(
    (1L, ts(0), "bronze", null),
    (1L, ts(5), "bronze", null),       // identical state — must collapse
    (2L, ts(1), "gold", "US"))
  // batch 2: key 1 changes twice (incl. null→value), key 2 repeats
  // (no new version), key 3 is new mid-stream
  private val b2: Seq[LogRow] = Seq(
    (1L, ts(10), "silver", null),
    (1L, ts(12), "silver", "DE"),      // null→value IS a change
    (2L, ts(11), "gold", "US"),        // identical state — no-op
    (3L, ts(11), "bronze", "FR"))

  private def dimSet(path: String): Set[(Long, Long, String, String, Timestamp, Timestamp, Long)] =
    graft.operators.Upsert.readTable(spark, path).collect().map { r: Row =>
      (r.getAs[Long]("cust_id"), r.getAs[Long]("version"),
        r.getAs[String]("segment"), r.getAs[String]("country"),
        r.getAs[Timestamp]("valid_from"), r.getAs[Timestamp]("valid_to"),
        r.getAs[Long]("is_current"))
    }.toSet

  test("streaming SCD2 apply over two micro-batches equals the batch rebuild") {
    val path = tmpDir("scd2-dim")
    val ckpt = tmpDir("scd2-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[LogRow]
    val df = in.toDF().toDF("cust_id", "ts", "segment", "country")
    val q = WarehouseStreams.scd2Sink(df, path, keys, "ts", Nil, attrs)
      .option("checkpointLocation", ckpt).start()
    try {
      in.addData(b1)
      q.processAllAvailable()
      // after batch 1: collapse happened, both keys current at version 1
      val mid = dimSet(path)
      assert(mid == Set(
        (1L, 1L, "bronze", null, ts(0), null, 1L),
        (2L, 1L, "gold", "US", ts(1), null, 1L)))
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val expected = Diff.scd2History(
      (b1 ++ b2).toDF("cust_id", "ts", "segment", "country"),
      keys, "ts", Nil, attrs)
      .collect().map { r: Row =>
        (r.getAs[Long]("cust_id"), r.getAs[Long]("version"),
          r.getAs[String]("segment"), r.getAs[String]("country"),
          r.getAs[Timestamp]("valid_from"), r.getAs[Timestamp]("valid_to"),
          r.getAs[Long]("is_current"))
      }.toSet
    assert(dimSet(path) == expected)
    // spot-check the interesting rows directly
    assert(dimSet(path).contains((1L, 2L, "silver", null, ts(10), ts(12), 0L)))
    assert(dimSet(path).contains((1L, 3L, "silver", "DE", ts(12), null, 1L)))
    assert(dimSet(path).contains((3L, 1L, "bronze", "FR", ts(11), null, 1L)))
  }

  test("replayed SCD2 micro-batch is a no-op (checkpoint-recovery contract)") {
    val path = tmpDir("scd2-replay")
    WarehouseStreams.scd2ApplyBatch(spark,
      b1.toDF("cust_id", "ts", "segment", "country"), path, keys, "ts", Nil, attrs)
    WarehouseStreams.scd2ApplyBatch(spark,
      b2.toDF("cust_id", "ts", "segment", "country"), path, keys, "ts", Nil, attrs)
    val once = dimSet(path)
    // at-least-once delivery: the same batch folds again after a failure
    WarehouseStreams.scd2ApplyBatch(spark,
      b2.toDF("cust_id", "ts", "segment", "country"), path, keys, "ts", Nil, attrs)
    assert(dimSet(path) == once)
  }

  test("driftSink appends one summary row per micro-batch matching the batch statistic") {
    val out = tmpDir("drift-out")
    val ckpt = tmpDir("drift-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq(1L, 1L, 2L, 3L).toDF("bucket")
    val in = MemoryStream[Long]
    val df = in.toDF().toDF("bucket")
    val q = WarehouseStreams.driftSink(df, baseline, "bucket", out)
      .option("checkpointLocation", ckpt).start()
    val mb1 = Seq(1L, 1L, 2L, 3L)      // identical distribution → tvd 0
    val mb2 = Seq(9L, 9L, 9L, 9L)      // disjoint support → tvd 10⁶
    try {
      in.addData(mb1)
      q.processAllAvailable()
      in.addData(mb2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect().map { r =>
      r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n_old"), r.getAs[Long]("n_new"), r.getAs[Long]("tvd_fp"))
    }.toMap
    assert(got.size == 2)
    assert(got(0L) == ((4L, 4L, 0L)))
    assert(got(1L) == ((4L, 4L, 1000000L)))
    // cross-check against the batch statistic each row claims to be
    val batchStat = WarehouseStreams.columnDriftBatch(
      baseline, mb2.toDF("bucket"), "bucket", 1L).collect().head
    assert(batchStat.getAs[Long]("tvd_fp") == got(1L)._3)
  }
}
