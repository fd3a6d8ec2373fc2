package graft.ext

import org.apache.spark.sql.functions._

/** Throwaway q50 sf1 cost breakdown (dev only): times the exact dual,
  * the LSH pair operator, and the LSH's internal stages separately. */
object Q50Probe {
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
    val dir = args.headOption.getOrElse("target/testdata/sf1")
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val n = e.count()
    println(s"|B| = $n")
    // the auto geometry annLshPairs would pick
    val pp = math.max(4, math.ceil(math.log(math.max(1.0, n / 128.0)) / math.log(2.0)).toInt)
    val bb = math.ceil(16.0 * math.pow(1.0 / 0.63, pp - 4)).toInt
    println(s"auto geometry: planesPerBand=$pp bands=$bb planes=${pp * bb}")
    val out = Similarity.annLshPairs(e, minCosine = 0.4)
    time("lsh pairs cold") { out.count() }
    // per-operator row counts from the executed plan's SQL metrics
    def walk(pl: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      val rows = pl.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      println(f"${"  " * d}${pl.nodeName}%-40s rows=$rows")
      pl match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, d + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, d + 1)
        case _ => pl.children.foreach(walk(_, d + 1))
      }
    }
    walk(out.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
