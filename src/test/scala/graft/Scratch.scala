package graft

import graft.core.Tables
import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

// Temporary profiling harness (not part of the library surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors min 32}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("AB", "10m"))
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("SMJ", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k1=v1;k2=v2" → session conf overrides
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    sys.env.get("SPARK_GRAFT_Q").foreach { q =>
      for (r <- 1 to sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt) {
        if (!sys.env.contains("SPARK_GRAFT_KEEPCACHE")) spark.catalog.clearCache()
        val df = t(s"$q construct run$r")(SparkEntry.queries(q)(spark, dir))
        val t0 = System.nanoTime()
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $q run$r: $dt%.2f s")
        if (dt > 10 || sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          println(df.queryExecution.executedPlan.toString.take(
            sys.env.getOrElse("SPARK_GRAFT_PLAN_CHARS", "9000").toInt))
      }
      spark.stop(); return
    }
    if (sys.env.contains("SPARK_GRAFT_SCALE_PROBE")) {
      val mult = sys.env("SPARK_GRAFT_SCALE_PROBE").toInt
      val d0 = Tables.load(spark, dir, "documents")
      val big = (0 until mult).map(k => d0.select((col("doc_id") * mult + k).as("doc_id"),
        col("text"))).reduce(_ union _)
      println(s"[scratch] scale probe: ${mult}x docs = " + big.count())
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = Dedup.nearDupJaccard(big, 16, 500 * mult, 0.5).count()
        println(f"[scratch] nearDupJaccard ${mult}x run$r: ${(System.nanoTime()-t0)/1e9}%.1f s pairs=$n")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val docs = Tables.load(spark, dir, "documents")
    val sh = Dedup.charShingles(docs, 16)
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df")).filter(col("df") <= 500)
    val shd = sh.join(dfreq, Seq("sh"))
    val hub = shd.groupBy(col("id"))
      .agg(sort_array(collect_list(
          concat(lpad(col("df").cast("string"), 9, "0"), col("sh")))).as("shs"),
        count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("hub materialize")(println("  hub=" + hub.count()))
    val prefixLen = (col("n") - ceil(col("n") * lit(0.5)) + lit(1)).cast("int")
    val pre = hub.select(col("id"), explode(slice(col("shs"), lit(1), prefixLen)).as("sh"))
    val cand = pre.groupBy(col("sh")).agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, ix) =>
        transform(slice(col("ids"), ix + lit(2), size(col("ids"))),
          y => struct(x.as("i"), y.as("j")))))).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .distinct()
    t("cand")(println("  cand=" + cand.count()))
    val ver = cand
      .join(hub.select(col("id").as("i"), col("shs").as("shs_i"), col("n").as("ni")), Seq("i"))
      .join(hub.select(col("id").as("j"), col("shs").as("shs_j"), col("n").as("nj")), Seq("j"))
      .withColumn("c", graft.functions.ArrayMath.sortedIntersectCount(col("shs_i"), col("shs_j")))
      .withColumn("jaccard", col("c").cast("double") / (col("ni") + col("nj") - col("c")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("i"), col("j"), col("jaccard"))
    t("verify")(println("  out=" + ver.count()))
    t("verify again")(println("  out=" + ver.count()))
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) println(ver.queryExecution.executedPlan.toString.take(9000))
    hub.unpersist()
    spark.stop()
  }
}
