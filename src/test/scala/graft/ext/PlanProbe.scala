package graft.ext

/** Throwaway plan probe (dev only — run via dev.sh, not part of suites). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val q = args.headOption.getOrElse("q149")
    val df = graft.SparkEntry.queries.filter(_._1.startsWith(q)).head._2(spark, dir)
    df.count() // materialize so AQE final plan exists
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
