package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway profiling main (not part of the library surface). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").filter(col("text").isNotNull)
    docs.count()
    val ws = split(col("text"), " ", -1)
    def hash60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    // the gram-generator shape used by masking/overlap/novelty ops
    val gramArr = transform(sequence(lit(1), size(ws) - 2),
      i => hash60(concat_ws(" ", slice(ws, i, lit(3)))))
    for (i <- 1 to 2) time(s"gram explode inline $i")(
      docs.filter(size(ws) >= 3).select(col("doc_id"), explode(gramArr).as("gk")).count())
    for (i <- 1 to 2) time(s"gram explode pre-projected $i") {
      val pre = docs.filter(size(ws) >= 3).select(col("doc_id"), gramArr.as("ga"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = pre.select(col("doc_id"), explode(col("ga")).as("gk")).count()
      pre.unpersist(blocking = true); n
    }
    spark.stop()
  }
}
