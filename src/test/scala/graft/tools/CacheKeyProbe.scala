package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
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
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    val full = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("docid"), col("text").as("gtext"))
      .groupBy(col("gtext"))
      .agg(sort_array(collect_list(col("docid"))).as("members"),
        min(col("docid")).as("rep"), count(lit(1)).as("gsize"))
    val sig = graft.core.Caches.persist(graft.ext.Dedup.simhashSignature(
      full.select(col("rep").as("doc_id"), col("gtext").as("text")), 16))
    sig.count()
    def banded0 = sig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sig"), 15 * k).bitwiseAND(lit(0x7FFFL))): _*)).as(Seq("band", "bh")))
    def pairsOf(banded: org.apache.spark.sql.DataFrame) = banded
      .select(col("band"), col("bh"), col("id").as("i"), col("sig").as("sig_i"))
      .join(banded.select(col("band"), col("bh"), col("id").as("j"), col("sig").as("sig_j"))
        .hint("shuffle_hash"), Seq("band", "bh"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("sig_i").bitwiseXOR(col("sig_j"))).cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
    val p32 = pairsOf(banded0)
    time("pairs @32 run1") { p32.count() }
    time("pairs @32 run2") { p32.count() }
    val p1 = pairsOf(banded0.repartition(1, col("band"), col("bh")))
    time("pairs @1  run1") { p1.count() }
    time("pairs @1  run2") { p1.count() }
    val p4 = pairsOf(banded0.repartition(4, col("band"), col("bh")))
    time("pairs @4  run1") { p4.count() }
    time("pairs @4  run2") { p4.count() }
    spark.stop()
  }
}
