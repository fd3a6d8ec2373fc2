package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata tables
  * (see /root/repo/TESTDATA.md, FIXTURES.md §B). Every query entry point
  * receives `sfDir` (e.g. "/root/testdata/sf0.01") and reads parquet
  * directly — filters/projections then push down to the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as INT64 TIMESTAMP(NANOS) (which Spark's
      // parquet reader rejects outright, [PARQUET_TYPE_ILLEGAL]) and as
      // plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark
      // reads as TIMESTAMP_NTZ). Normalize BOTH to a micros TimestampType
      // column — the session zone is pinned to UTC, so the NTZ cast is
      // wall-clock-identical, and the nanos path floor-converts exactly
      // like DuckDB's epoch_ms in the oracles.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      val norm = raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
      norm.select(raw.columns.toIndexedSeq.map(col): _*)
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register all tables as temp views (for spark.sql-style entry points). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Ensure at least default parallelism ahead of CPU-heavy map stages
    * (shingling, per-pair scoring). A small table often arrives as ONE
    * parquet split, which would serialize the expensive downstream map work
    * onto a single core; a large scan is left untouched.
    *
    * The small/large probe reads the LOGICAL plan's size statistic
    * (file-index bytes for file sources, row sizes for local relations) —
    * `df.rdd.getNumPartitions` would instantiate the physical plan of the
    * whole subtree just to read a partition count, a measurable
    * plan-build cost on wide scans that this helper sits in front of.
    * A table under `parallelism × maxPartitionBytes` may scan with fewer
    * splits than cores; for those the cheap physical partition-count probe
    * decides (a small plan is cheap to plan physically, and skipping the
    * probe would add an exchange to frames that already have ≥ p splits —
    * e.g. a small many-file table). Anything statted larger already yields
    * ≥ parallelism natural splits and is left untouched. Plans with
    * UNKNOWN stats (RDD-backed frames report the defaultSizeInBytes
    * sentinel — and so do joined plans whose multiplied stats saturate
    * past it) take the same probe path — treating the sentinel as "large"
    * would silently return the single-core serialization this helper
    * exists to prevent. */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val spark = df.sparkSession
      val p = spark.sparkContext.defaultParallelism
      val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
      val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val knownLarge = size < BigInt(spark.sessionState.conf.defaultSizeInBytes) &&
        size >= BigInt(p.toLong) * maxPartitionBytes
      if (knownLarge) df
      else if (df.rdd.getNumPartitions < p) df.repartition(p)
      else df
    }
  }
}
