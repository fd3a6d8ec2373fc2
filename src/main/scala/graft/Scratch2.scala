package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway profiling main (not part of the library surface). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    def oldHash(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    def newHash(c: org.apache.spark.sql.Column) = graft.functions.TextMetrics.hash60(c)
    // equality check first
    val neq = docs.select(oldHash(col("text")).as("o"), newHash(col("text")).as("n"))
      .filter(col("o") =!= col("n")).count()
    println(s"mismatches on docs text: $neq")
    def gramArr(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      transform(sequence(lit(1), size(ws) - 2),
        i => h(concat_ws(" ", slice(ws, i, lit(3)))))
    for (i <- 1 to 3) time(s"grams OLD hash $i")(
      docs.filter(size(ws) >= 3).select(col("doc_id"), explode(gramArr(oldHash)).as("gk")).count())
    for (i <- 1 to 3) time(s"grams NEW hash $i")(
      docs.filter(size(ws) >= 3).select(col("doc_id"), explode(gramArr(newHash)).as("gk")).count())
    spark.stop()
  }
}
