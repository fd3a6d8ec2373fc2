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
    if (sys.env.contains("SPARK_GRAFT_Q149_PROBE")) {
      // q149 stage breakdown: positive pass vs rank table vs full operator
      import graft.ext.{Similarity, Sharding}
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })
      def tj[A](name: String)(f: => A): A = {
        val (j0, s0) = (jobs.get, stages.get)
        val r = t(name)(f)
        println(s"[scratch]   jobs=${jobs.get - j0} stages=${stages.get - s0}")
        r
      }
      val e = Tables.load(spark, dir, "embeddings")
      println("[scratch] |e| = " + e.count())
      val anchors = e.filter(col("vec_id") < 32)
      for (r <- 1 to 3) {
        spark.catalog.clearCache(); graft.core.Caches.unpersistAll()
        val full = tj(s"run$r construct (incl. shuffleOrderCount)") {
          Similarity.contrastivePairs(anchors, e, 4, 0.2)
        }
        tj(s"run$r full exec") { full.count() }
        tj(s"run$r pos-only") {
          Similarity.contrastivePairs(anchors, e, 4, 0.2)
            .filter(col("role") === "pos").count()
        }
        tj(s"run$r neg-only") {
          Similarity.contrastivePairs(anchors, e, 4, 0.2)
            .filter(col("role") === "neg").count()
        }
        tj(s"run$r shuffleOrderAt(128 seqs)") {
          val seqs = spark.range(1, 129).select(col("id").as("seq"))
          Sharding.shuffleOrderAt(e, seqs, "cp:rank", "vec_id").count()
        }
      }
      spark.stop(); return
    }
    if (sys.env.contains("SPARK_GRAFT_ANN_PROBE")) {
      // Round-15 banded-path probe: since the r14 dense path landed, no
      // board query exercises the banded plan that actually runs at
      // 100 TB (reps > pairsDenseMaxBase=2^17). Two parts:
      //  A) sf-scale corpus (SPARK_GRAFT_SF_DIR embeddings): dense output
      //     is ground truth; the FORCED banded run must reproduce it
      //     within the auto-geometry recall contract.
      //  B) synthetic corpus PAST 2^17 reps with planted near-identical
      //     pairs: auto path must choose banded on its own, find the
      //     planted pairs, and complete in bounded wall.
      import graft.ext.Similarity
      val e = Tables.load(spark, dir, "embeddings")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("i"), col("j")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime()
      val dense = pairs(Similarity.annLshPairs(e, minCosine = 0.4))
      val tDense = (System.nanoTime() - t0) / 1e9
      println(f"[ann-probe] A dense: ${dense.size} pairs, $tDense%.1f s, " +
        s"path=${Similarity.lastPairsPath.get()}")
      spark.catalog.clearCache(); graft.core.Caches.unpersistAll()
      spark.conf.set("spark.graft.similarity.pairsDenseMaxBase", "0")
      val t1 = System.nanoTime()
      val banded = pairs(Similarity.annLshPairs(e, minCosine = 0.4))
      val tBanded = (System.nanoTime() - t1) / 1e9
      val recallA =
        if (dense.isEmpty) 1.0 else dense.intersect(banded).size.toDouble / dense.size
      println(f"[ann-probe] A banded: ${banded.size} pairs, $tBanded%.1f s, " +
        f"path=${Similarity.lastPairsPath.get()}, recall=$recallA%.4f, " +
        s"false_pos=${banded.diff(dense).size}")
      spark.conf.unset("spark.graft.similarity.pairsDenseMaxBase")
      spark.catalog.clearCache(); graft.core.Caches.unpersistAll()

      // B: 2^17 < n, planted dups — auto geometry must band
      val nBase = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "180000").toLong
      val nPlant = 200
      def vecExpr(idc: org.apache.spark.sql.Column, perturb: Boolean) = {
        val comp = transform(sequence(lit(0), lit(63)), c =>
          ((pmod(graft.functions.TextMetrics.hash60(
            concat_ws(":", lit("annp"), idc.cast("string"), c.cast("string"))),
            lit(2000L)) - lit(1000L)).cast("double") / lit(1000.0) +
            (if (perturb) when(c === 0, lit(0.05)).otherwise(lit(0.0))
             else lit(0.0))).cast("float"))
        comp
      }
      val base = spark.range(nBase).select(col("id").as("vec_id"),
        vecExpr(col("id"), perturb = false).as("embedding"))
      val planted = spark.range(nPlant).select((col("id") + lit(10000000L)).as("vec_id"),
        vecExpr(col("id"), perturb = true).as("embedding"))
      val corpus = base.unionByName(planted)
      val t2 = System.nanoTime()
      // random 64-dim vectors throw off ~1e4-1e7 true pairs depending on
      // the bar — COUNT, never collect (the planted hits are a filter)
      val out = graft.core.Caches.persist(
        Similarity.annLshPairs(corpus, minCosine = 0.7))
      val total = out.count()
      val tB = (System.nanoTime() - t2) / 1e9
      val path = Similarity.lastPairsPath.get()
      val hit = out.filter(col("j") - col("i") === 10000000L &&
        col("i") < nPlant).count()
      println(f"[ann-probe] B n=${nBase + nPlant} path=$path pairs=$total " +
        f"planted_recall=${hit.toDouble / nPlant}%.3f wall=$tB%.1f s")
      require(path == "banded", s"auto geometry must band past 2^17 reps, saw $path")
      spark.stop(); return
    }
    if (sys.env.contains("SPARK_GRAFT_PQ_SWEEP")) {
      // q122 PQ-recall parameter sweep at a given corpus (SPARK_GRAFT_SF_DIR)
      import graft.ext.Similarity
      val e = Tables.load(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 32)
      val exact = Similarity.bruteForceTopK(q, e, 5)
        .select(col("qid"), col("vid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nc, np, rf) <- Seq((16, 4, 32), (16, 4, 128), (45, 4, 32), (45, 8, 64),
          (141, 8, 64), (141, 16, 64), (64, 8, 64), (141, 12, 96))) {
        val t0 = System.nanoTime()
        val ann = Similarity.pqTopK(q, e, 5, nCells = nc, nProbe = np, refine = rf)
          .select(col("qid"), col("vid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = exact.intersect(ann).size.toDouble / exact.size
        println(f"[pq] nCells=$nc nProbe=$np refine=$rf recall=$rec%.3f ${(System.nanoTime()-t0)/1e9}%.1f s")
        spark.catalog.clearCache(); graft.core.Caches.unpersistAll()
      }
      spark.stop(); return
    }
    if (sys.env.contains("SPARK_GRAFT_SCALE_PROBE")) {
      // Dup-dense DENSE-path probe (round-10): over a GenData
      // --dup-permille corpus (SPARK_GRAFT_SF_DIR), run the q37/q38
      // operators twice per ceiling setting — default ceilings first (the
      // ground truth; pre-cleared broadcast shape at these corpus sizes),
      // then with the id/byte ceilings LOWERED so the corpus's own
      // candidate volume trips the DENSE no-broadcast path — and require
      // identical pair counts plus the expected path choice. Prints
      // wall-times so a 10x corpus can be checked for cliffs.
      val docs = Tables.load(spark, dir, "documents")
      val nDocs = docs.count()
      val cap = 500 * math.max(1L, nDocs / 5000).toInt
      println(s"[probe] corpus=$dir docs=$nDocs dfCap=$cap")
      def run(tag: String): (Long, Long, String, String) = {
        spark.catalog.clearCache(); graft.core.Caches.unpersistAll()
        val t0 = System.nanoTime()
        val n37 = Dedup.nearDupJaccard(docs, 16, cap, 0.5).count()
        val p37 = Dedup.lastVerifyPath.get()
        val t1 = System.nanoTime()
        graft.core.Caches.unpersistAll()
        val n38 = Dedup.minhashLshPairs(docs, 16, cap, 128, 4, 0.7).count()
        val p38 = Dedup.lastVerifyPath.get()
        val t2 = System.nanoTime()
        println(f"[probe] $tag: q37 pairs=$n37 path=$p37 ${(t1 - t0) / 1e9}%.1f s; " +
          f"q38 pairs=$n38 path=$p38 ${(t2 - t1) / 1e9}%.1f s")
        (n37, n38, p37, p38)
      }
      val truth = run("default-ceilings cold")
      run("default-ceilings warm")
      spark.conf.set("spark.graft.dedup.verifyIdBroadcastRows",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_IDROWS", "1000"))
      spark.conf.set("spark.graft.dedup.verifyBroadcastBytes",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_BYTES", "1048576"))
      val dense = run("lowered-ceilings cold")
      run("lowered-ceilings warm")
      require(dense._3 == "dense" && dense._4 == "dense",
        s"expected dense path, saw q37=${dense._3} q38=${dense._4}")
      require((dense._1, dense._2) == ((truth._1, truth._2)),
        s"pair counts diverged: dense=(${dense._1},${dense._2}) truth=(${truth._1},${truth._2})")
      println("[probe] OK: dense path engaged; pair counts match ground truth")
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
