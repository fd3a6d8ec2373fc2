package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The pipeline data model, mirroring the reference's Message
  * (`/root/reference/src/lib.rs:36-40`: opaque payload + string metadata)
  * in Spark-native terms:
  *
  *   - `text`     — the payload. The reference stores raw bytes and decodes
  *                  UTF-8 in every text operator (panicking on invalid input);
  *                  we store StringType directly and keep BinaryType for the
  *                  multimodal path (graft.multimodal).
  *   - `metadata` — MAP<STRING,STRING>, the per-message tag map. Only ever
  *                  read by the Kafka sink (`partition_key`); fan-out
  *                  operators DROP it, matching reference behavior
  *                  (`src/regex.rs:117-120`).
  *   - `batch_id` — identity of the source batch. Structured Streaming
  *                  micro-batches subsume the reference's per-record batches;
  *                  batch_id is carried only for the `process` operator,
  *                  whose child-process framing is per-batch
  *                  (`src/processors.rs:123-131`).
  */
case class Message(
    text: String,
    metadata: Map[String, String] = Map.empty,
    batch_id: Long = 0L)

object Model {
  val TextCol = "text"
  val MetadataCol = "metadata"
  val BatchIdCol = "batch_id"

  def toDF(spark: SparkSession, msgs: Seq[Message]): Dataset[Message] = {
    import spark.implicits._
    spark.createDataset(msgs)
  }

  def fromLines(spark: SparkSession, lines: Seq[String]): Dataset[Message] =
    toDF(spark, lines.zipWithIndex.map { case (l, i) => Message(l, Map.empty, i.toLong) })
}
