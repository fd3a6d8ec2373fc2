package graft.ext
object CandProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      graft.core.Caches.unpersistAll(); spark.catalog.clearCache()
      val docs = graft.core.Tables.load(spark, dir, "documents")
      val t0 = System.nanoTime()
      val n = Dedup.nearDupJaccard(docs, 16, minJaccard = 0.5).count()
      println(f"[cand] dir=$dir docs=${docs.count()} cap=${Dedup.fractionalDfCap(docs)} pairs=$n ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
