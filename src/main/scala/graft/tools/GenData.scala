package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic-data generator for SCALE SMOKES above the
  * driver-provided testdata (TESTDATA.md caps at sf0.1). Mirrors the
  * driver tables' schemas exactly (verified against
  * the sf0.1 parquet footers) and their statistical shape loosely:
  * the same ~30-word document vocabulary, document lengths 8–90 words,
  * ~0.8% exact-dup and ~1.7% near-dup planted documents (so the near-dup
  * family has realistic work, not a degenerate zero-pair corpus), and
  * 10-cluster unit-normalized embeddings with ~1% near-identical copies.
  *
  * Everything derives from xxhash64 of (row id, salt) — no RNG state, no
  * Date.now: the same (sf, outDir) invocation writes bit-identical
  * parquet on any machine. Generation is pure column expressions over
  * spark.range — parallel, no driver loops.
  *
  * Usage: graft.tools.GenData <outDir> [sfTimes10xOf0.1]
  *   e.g. `GenData target/testdata/sf1 10` writes a 10× sf0.1 dataset
  *   (~6M lineitem, 50k docs, 20k embeddings) — the round-8 sf1 smoke.
  */
object GenData {

  private def h(cols: Column*): Column = xxhash64(cols: _*)
  /** uniform in [0,1) from hashed seeds */
  private def u(cols: Column*): Column =
    pmod(h(cols: _*), lit(1000000L)).cast(DoubleType) / lit(1000000.0)
  private def pick(options: Seq[String], cols: Column*): Column = {
    val arr = typedLit(options)
    element_at(arr, (pmod(h(cols: _*), lit(options.size.toLong)) + 1).cast(IntegerType))
  }

  private val Vocab = Seq("spark", "batch", "part", "line", "column", "order",
    "small", "sort", "fast", "value", "scan", "hash", "slow", "group", "agg",
    "filter", "query", "a", "big", "key", "window", "row", "table", "stream",
    "merge", "data", "the", "join", "vector", "customer")

  private val Epoch92 = 694224000L // 1992-01-01 UTC

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val times = if (args.length > 1) args(1).toInt else 10 // × sf0.1
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors min 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir, times, cpus)
    spark.stop()
  }

  def write(spark: SparkSession, outDir: String, times: Int, cpus: Int): Unit = {
    val nLineitem = 600000L * times
    val nOrders = 150000L * times
    val nCustomer = 15000L * times
    val nSupplier = 1000L * times
    val nPart = 20000L * times
    val nEvents = 100000L * times
    val nDocs = 5000L * times
    val nVecs = 2000L * times

    def range(n: Long) = spark.range(0L, n, 1L, cpus)
    def save(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[gendata] wrote $name")
    }

    save(spark.createDataFrame(Seq(
      (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST")))
      .toDF("r_regionkey", "r_name"), "region")

    save(range(25).select(
      col("id").cast(IntegerType).as("n_nationkey"),
      concat(lit("nation_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5L)).cast(IntegerType).as("n_regionkey")), "nation")

    save(range(nCustomer).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id").cast(StringType), 9, "0")).as("c_name"),
      pmod(h(col("id"), lit("cn")), lit(25L)).cast(IntegerType).as("c_nationkey"),
      (u(col("id"), lit("cb")) * 11000.0 - 1000.0).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
        col("id"), lit("cm")).as("c_mktsegment")), "customer")

    save(range(nSupplier).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id").cast(StringType), 9, "0")).as("s_name"),
      pmod(h(col("id"), lit("sn")), lit(25L)).cast(IntegerType).as("s_nationkey"),
      (u(col("id"), lit("sb")) * 11000.0 - 1000.0).as("s_acctbal")), "supplier")

    save(range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick(Vocab, col("id"), lit("pn1")), lit(" "),
        pick(Vocab, col("id"), lit("pn2")), lit(" "),
        pick(Vocab, col("id"), lit("pn3"))).as("p_name"),
      concat(lit("Brand#"), pmod(h(col("id"), lit("pb")), lit(50L))).as("p_brand"),
      concat(pick(Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"),
          col("id"), lit("pt1")), lit(" "),
        pick(Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"),
          col("id"), lit("pt2")), lit(" "),
        pick(Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER"),
          col("id"), lit("pt3"))).as("p_type"),
      (pmod(h(col("id"), lit("ps")), lit(50L)) + 1).cast(IntegerType).as("p_size"),
      (u(col("id"), lit("pr")) * 2000.0 + 900.0).as("p_retailprice")), "part")

    save(range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(h(col("id"), lit("oc")), lit(nCustomer)).as("o_custkey"),
      pick(Seq("O", "F", "P"), col("id"), lit("os")).as("o_orderstatus"),
      (u(col("id"), lit("op")) * 400000.0 + 1000.0).as("o_totalprice"),
      timestamp_seconds(lit(Epoch92) +
        pmod(h(col("id"), lit("od")), lit(86400L * 2400)))
        .as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        col("id"), lit("opr")).as("o_orderpriority")), "orders")

    // lineitem: 4 lines per order on average, line number dense per order
    save(range(nLineitem).select(
      pmod(h(col("id"), lit("lo")), lit(nOrders)).as("l_orderkey"),
      pmod(h(col("id"), lit("lp")), lit(nPart)).as("l_partkey"),
      pmod(h(col("id"), lit("ls")), lit(nSupplier)).as("l_suppkey"),
      col("id"), // keep for the window below
      (u(col("id"), lit("lq")) * 49.0 + 1.0).as("l_quantity"),
      (u(col("id"), lit("le")) * 99000.0 + 900.0).as("l_extendedprice"),
      (pmod(h(col("id"), lit("ld")), lit(11L)).cast(DoubleType) / 100.0).as("l_discount"),
      (pmod(h(col("id"), lit("lt")), lit(9L)).cast(DoubleType) / 100.0).as("l_tax"),
      pick(Seq("R", "A", "N"), col("id"), lit("lr")).as("l_returnflag"),
      pick(Seq("O", "F"), col("id"), lit("ll")).as("l_linestatus"),
      timestamp_seconds(lit(Epoch92) +
        pmod(h(col("id"), lit("lsd")), lit(86400L * 2500)))
        .as("l_shipdate"))
      .withColumn("l_linenumber",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey")).orderBy(col("id"))).cast(IntegerType))
      .drop("id")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"), "lineitem")

    save(range(nEvents).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(Epoch92 + 86400L * 9000) +
        pmod(h(col("id"), lit("et")), lit(86400L * 30))).as("ts"),
      pmod(h(col("id"), lit("eu")), lit(nEvents / 10)).as("user_id"),
      pick(Seq("click", "view", "purchase", "signup", "error"),
        col("id"), lit("ety")).as("event_type"),
      (u(col("id"), lit("ev")) * 100.0).as("value"),
      concat(lit("{\"device\":\""),
        pick(Seq("mobile", "desktop", "tablet"), col("id"), lit("ed")),
        lit("\",\"v\":"), pmod(h(col("id"), lit("epv")), lit(10L)),
        lit("}")).as("props")), "events")

    // documents — planted duplicate structure:
    //   hash(id) < 8/1000  → EXACT copy of doc id-997
    //   hash(id) < 25/1000 → NEAR-dup of doc id-991 (~1 in 12 words mutated)
    // word w(base, p) = Vocab[h(base,"w",p)], so a clone regenerates its
    // base's words from the base id alone — no self-join needed.
    val docSel = pmod(h(col("id"), lit("dupsel")), lit(1000L))
    val isExact = docSel < 8 && col("id") >= 997
    val isNear = !isExact && docSel < 25 && col("id") >= 991
    val base = when(isExact, col("id") - 997)
      .when(isNear, col("id") - 991).otherwise(col("id"))
    val len = (pmod(h(base, lit("len")), lit(83L)) + 8).cast(IntegerType)
    def word(seed: Column, p: Column) =
      element_at(typedLit(Vocab), (pmod(h(seed, lit("w"), p), lit(30L)) + 1).cast(IntegerType))
    val words = transform(sequence(lit(1), len), p =>
      when(isNear && pmod(h(col("id"), lit("m"), p), lit(12L)) === 0,
        word(h(col("id"), lit("alt")), p))
        .otherwise(word(base, p)))
    save(range(nDocs)
      .withColumn("text", array_join(words, " "))
      .select(
        col("id").as("doc_id"),
        col("text"),
        pick(Seq("en", "en", "en", "en", "zh", "zh", "es", "es", "fr", "de"),
          col("id"), lit("dl")).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20L))).as("source"),
        length(col("text")).as("n_chars")), "documents")

    // embeddings — 10 WEAKLY-clustered hash-centered groups on the unit
    // sphere (center/noise scales chosen so typical within-cluster cosine
    // sits ≈0.1, far under the family's 0.4 thresholds — the driver data's
    // shape: q41 finds ~0.003% of pairs, not percent-level), plus ~1%
    // planted near-copies in two tiers (cos ≈ 0.999 and ≈ 0.93) so
    // SemDeDup/near-dup ANN have dup-density-scaled work. All doubles
    // until the final float cast.
    val vSel = pmod(h(col("id"), lit("edup")), lit(1000L))
    val isCopy = vSel < 10 && col("id") >= 777
    val vBase = when(isCopy, col("id") - 777).otherwise(col("id"))
    val vLabel = pmod(h(vBase, lit("lab")), lit(10L))
    val jitScale = when(pmod(h(col("id"), lit("jt")), lit(2L)) === 0, lit(0.005))
      .otherwise(lit(0.1))
    def comp(seed: Column, j: Column, salt: String, scale: Double) =
      (pmod(h(seed, lit(salt), j), lit(2001L)).cast(DoubleType) - 1000.0) / 1000.0 * scale
    val raw = transform(sequence(lit(0), lit(63)), j =>
      comp(vLabel, j, "c", 0.10) + comp(vBase, j, "n", 0.35) +
        when(isCopy, comp(col("id"), j, "jit", 1.0) * jitScale).otherwise(lit(0.0)))
    save(range(nVecs)
      .withColumn("raw", raw)
      .withColumn("nrm", sqrt(graft.functions.ArrayMath.dotDouble(col("raw"), col("raw"))))
      .select(
        col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast(FloatType)).as("embedding"),
        vLabel.cast(IntegerType).as("label")), "embeddings")
  }
}
