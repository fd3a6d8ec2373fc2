package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object CacheKeyProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-34s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    val groups = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("docid"), col("text").as("gtext"))
      .groupBy(col("gtext"))
      .agg(min(col("docid")).as("rep"), count(lit(1)).as("gsize"))
    val sh = groups.select(col("rep").as("id"), col("gsize"),
      explode(graft.functions.TextShingles.charNgramSet(col("gtext"), 16)).as("sh"))
    val cap = 500
    // A: current — collect_list + filter + explode back
    def shA = sh.groupBy(col("sh"))
      .agg(collect_list(struct(col("id"), col("gsize"))).as("ids"),
        sum(col("gsize")).as("df"))
      .filter(col("df") <= cap)
      .select(col("sh"), col("df"), explode(col("ids")).as("m"))
      .select(col("sh"), col("df"), col("m.id").as("id"))
    // B: window sum over partition by sh
    def shB = sh.withColumn("df", sum(col("gsize")).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= cap)
      .select(col("sh"), col("df"), col("id"))
    // JIT warm both paths twice
    for (r <- 1 to 3) {
      time(s"A collect_list run$r") { shA.count() }
      time(s"B window      run$r") { shB.count() }
    }
    spark.stop()
  }
}
