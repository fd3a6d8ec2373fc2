package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.types.{StructField, StructType}

/** Pins [[GenData]]'s output schemas to the DRIVER-generated parquet
  * footers: if the driver's testdata schema drifts, this spec fails at
  * `sbt test` time instead of a scale smoke failing an hour in. Also
  * covers the round-9 CLI extensions (fractional scale, table subset,
  * seed salt). */
class GenDataSpec extends SparkSpec {

  private def norm(s: StructType): StructType =
    StructType(s.fields.map(f => StructField(f.name, f.dataType, nullable = true)))

  test("generated schemas match the driver sf0.1 parquet footers for every table") {
    val out = java.nio.file.Files.createTempDirectory("gendata-schema").toString
    // ~1% of sf0.1 per table: big enough to exercise every column expr,
    // small enough for test time
    GenData.write(spark, out, times = 0.01, cpus = 4)
    GenData.AllTables.foreach { t =>
      val driver = spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet").schema
      val gen = spark.read.parquet(s"$out/$t.parquet").schema
      assert(norm(gen) == norm(driver),
        s"schema drift on $t:\n  gen   =$gen\n  driver=$driver")
    }
  }

  test("--tables subset writes only the named tables; salt changes content, not schema") {
    val out = java.nio.file.Files.createTempDirectory("gendata-subset").toString
    GenData.write(spark, out, times = 0.01, cpus = 4, salt = "s9",
      tables = Set("documents", "embeddings"))
    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(written == Set("documents.parquet", "embeddings.parquet"))
    val out2 = java.nio.file.Files.createTempDirectory("gendata-salt").toString
    GenData.write(spark, out2, times = 0.01, cpus = 4, salt = "",
      tables = Set("documents"))
    val salted = spark.read.parquet(s"$out/documents.parquet")
    val unsalted = spark.read.parquet(s"$out2/documents.parquet")
    assert(norm(salted.schema) == norm(unsalted.schema))
    assert(salted.count() == unsalted.count())
    // different salt ⇒ different planted corpus (content independence)
    val a = salted.selectExpr("min(text)").head.getString(0)
    val b = unsalted.selectExpr("min(text)").head.getString(0)
    assert(a != b, "salt must produce a statistically independent corpus")
  }

  test("--dup-permille raises near-dup density without changing schema or count") {
    // times = 1 (5000 docs): the plant gates on doc_id >= 991, so a
    // smaller corpus has almost no eligible rows
    def gen(permille: Int): org.apache.spark.sql.DataFrame = {
      val out = java.nio.file.Files.createTempDirectory(s"gendata-dup$permille").toString
      GenData.write(spark, out, times = 1, cpus = 4,
        tables = Set("documents"), dupPermille = permille)
      spark.read.parquet(s"$out/documents.parquet")
    }
    val base = gen(25)
    val dense = gen(300)
    assert(norm(base.schema) == norm(dense.schema))
    assert(base.count() == dense.count())
    // same seeds, only the near-dup gate widens: the docs whose text
    // changed are exactly the newly-near-dup rows — expect ≈ 27.5% of
    // the eligible (doc_id ≥ 991) ids ≈ 22% of 5000
    val changed = base.select("doc_id", "text")
      .join(dense.withColumnRenamed("text", "t2").select("doc_id", "t2"), "doc_id")
      .filter("text <> t2").count()
    val frac = changed.toDouble / base.count()
    assert(frac > 0.15 && frac < 0.33,
      f"expected ~22%% newly-planted near-dups, got $frac%.3f")
  }

  test("--vocab-growth widens the vocabulary with scale; default stays fixed-30") {
    import org.apache.spark.sql.functions._
    def vocabOf(times: Double, beta: Double): Long = {
      val out = java.nio.file.Files
        .createTempDirectory(s"gendata-vocab$times-$beta").toString
      GenData.write(spark, out, times = times, cpus = 4,
        tables = Set("documents"), vocabGrowth = beta)
      spark.read.parquet(s"$out/documents.parquet")
        .select(explode(split(col("text"), " ")).as("t"))
        .agg(countDistinct(col("t"))).head.getLong(0)
    }
    // default (beta = 0): fixed 30-word vocabulary at any scale
    assert(vocabOf(0.5, 0.0) == 30L)
    // Heaps beta = 0.5: V = ceil(30 * times^0.5); the floor keeps
    // times <= 1 at the legacy 30, larger corpora grow sublinearly
    assert(vocabOf(0.5, 0.5) == 30L)
    assert(vocabOf(4.0, 0.5) == 60L)
  }
}
