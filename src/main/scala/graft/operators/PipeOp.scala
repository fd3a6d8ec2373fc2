package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The reference's `process` operator (src/processors.rs:101-152): pipe rows
  * through an external command as newline-delimited text, reading its stdout
  * back as rows.
  *
  * The reference joins one *batch* of messages into a single stdin payload
  * and splits stdout on '\n' dropping empty trailing segments
  * (src/processors.rs:123-145). In Spark the natural unit is the partition:
  * `RDD.pipe` spawns one child per partition, streams the partition's rows to
  * its stdin, and emits one output row per stdout line — the same contract
  * for line-oriented commands (the reference's own test uses awk as a line
  * splitter, src/processors.rs:172-200), and the only shape that scales:
  * one child per partition means 32 concurrent children on local[32] and
  * 1000s on a real cluster, with no driver involvement.
  *
  * Batch-boundary-sensitive commands can pre-`repartition` by a batch key so
  * a partition corresponds to one logical batch (SURVEY.md §7.4#3).
  *
  * The child binary must exist on every executor — an executor-image
  * requirement, documented here as in SURVEY.md §7.4#3.
  */
object PipeOp {

  /** Pipe a single string column through `command`, one child process per
    * partition. Output: one row per stdout line, column name `lineCol`.
    * Metadata is dropped (reference: output messages are rebuilt with
    * default metadata, src/processors.rs:141-144).
    */
  def pipe(df: DataFrame, textCol: String, command: Seq[String],
      lineCol: String = "line"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines: Dataset[String] = df.select(textCol).as[String]
    spark.createDataset(lines.rdd.pipe(command)).toDF(lineCol)
  }
}
