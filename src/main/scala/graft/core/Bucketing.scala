package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the zero-shuffle path for fact-fact joins
  * repeated across many queries (SURVEY.md §2.4 / the 100 TB posture:
  * pre-shuffle ONCE at write time, join forever after without an
  * exchange).
  *
  * Spark bucketing lives on managed/external tables: `bucketBy(n, keys)`
  * hash-partitions files at write time and records the layout in the
  * catalog, so a join of two tables bucketed on the same keys with the
  * same bucket count needs no Exchange on either side (verified by the
  * accompanying test, which asserts the join plan is exchange-free).
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) external parquet table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key column")
    require(buckets > 0, "bucket count must be positive")
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — planner emits no
    * shuffle for either side PROVIDED both tables were bucketed on `keys`
    * with the same bucket count (mismatched layouts silently fall back to a
    * shuffled join; use [[assertColocated]] to verify the plan). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "bucketed join requires at least one key column")
    spark.table(left).join(spark.table(right), keys, joinType)
  }

  /** Throws if `df`'s physical plan contains any Exchange — the check that
    * a supposedly co-located join really is shuffle-free. */
  def assertColocated(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"),
      s"expected an exchange-free co-located plan, got:\n$plan")
  }
}
