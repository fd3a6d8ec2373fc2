package graft.ext

/** Throwaway q50 A/B probe (dev only, round-16 regression triage):
  * bench-protocol timing of the full q50 with per-run job/stage/task
  * counts from a listener — run against two builds to diff the plans'
  * scheduling shape, not just wall time. */
object Q50AB {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("q50_embedding_neardup_lsh")
    def run(tag: String): Unit = {
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"$tag%-6s ${secs}%.3f s  jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
    }
    fn(spark, "/root/testdata/sf0.001").count()   // JIT warmup, Bench-style
    graft.core.Caches.unpersistAll(); spark.catalog.clearCache(); System.gc()
    run("cold")
    run("warm1"); run("warm2"); run("warm3")
    spark.stop()
  }
}
