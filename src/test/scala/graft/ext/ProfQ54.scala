package graft.ext
import org.apache.spark.sql.functions._

object ProfQ54 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.queries.Corpus
    graft.core.Caches.unpersistAll()
    t("q54 cold")(Corpus.queries("q54_boilerplate_ngrams")(spark, dir).count())
    (1 to 3).foreach(i => t(s"q54 warm$i")(Corpus.queries("q54_boilerplate_ngrams")(spark, dir).count()))
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val sh = Dedup.charShingles(docs, 16)
    t("shingle explode only")(sh.count())
    val agg = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    t("groupBy sh")(agg.count())
    t("top50")(agg.orderBy(col("df").desc, col("sh")).limit(50).count())
    // hash-count variant: count by 8-byte key, top by df, then resolve strings
    val hagg = sh.select(xxhash64(col("sh")).as("h")).groupBy(col("h")).agg(count(lit(1)).as("df"))
    t("groupBy hash")(hagg.count())
    spark.stop()
  }
}
