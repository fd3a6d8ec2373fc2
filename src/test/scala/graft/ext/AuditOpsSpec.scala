package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Controlled-input coverage for the round-5 audit operators beyond the
  * DuckDB-oracle gate: tf·idf cosine pair semantics (weighting, the df
  * cap, the exact integer threshold), source-divergence boundary values,
  * z-order bit math and write-plan shape, profiling nulls/types, and
  * keyword-classifier scoring. */
class AuditOpsSpec extends SparkSpec {

  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("tfidfCosinePairs: exact copies pair at cos 1; disjoint and weakly-overlapping docs don't") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // exact copy of 1
      (3L, "epsilon zeta eta theta"),   // disjoint
      (4L, "alpha beta iota kappa")     // ~half overlap with 1 → below 0.7
    ).toDF("doc_id", "text")
    val out = Search.tfidfCosinePairs(df, minCosNum = 7, minCosDen = 10, maxDf = 4)
    assert(pairSet(out) == Set((1L, 2L)))
    val r = out.collect().head
    // identical vectors: the integer filter admits the pair exactly;
    // the float report sits at 10⁶ up to one ulp of sqrt·sqrt
    assert(r.getAs[Long]("cos_fp") >= 999999L)
    assert(r.getAs[Long]("na2") == r.getAs[Long]("nb2"))
    assert(r.getAs[Long]("n_common") == 4L)
  }

  test("tfidfCosinePairs: ubiquitous terms are df-capped out of the vocabulary") {
    // "common" appears in every doc; with maxDf = 3 < 4 docs it cannot
    // generate candidates — docs sharing ONLY it never pair
    val df = Seq(
      (1L, "common alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common epsilon zeta eta"),
      (4L, "common theta iota kappa")
    ).toDF("doc_id", "text")
    val out = Search.tfidfCosinePairs(df, minCosNum = 7, minCosDen = 10, maxDf = 3)
    assert(pairSet(out) == Set((1L, 2L)))
  }

  test("tfidfCosinePairs: rare shared vocabulary outweighs common shared vocabulary") {
    // d1/d2 share a rare term among mostly-different text; d1/d3 share a
    // term present in every doc. idf weighting keeps (1,2) candidates
    // only via the rare term; with a low threshold both pairs form, and
    // the rare-term pair scores HIGHER despite equal raw overlap
    val df = Seq(
      (1L, "rareterm filler1 filler2"),
      (2L, "rareterm other1 other2"),
      (3L, "filler1 third1 third2"),
      (4L, "filler1 fourth1 fourth2")
    ).toDF("doc_id", "text")
    val out = Search.tfidfCosinePairs(df, minCosNum = 1, minCosDen = 10, maxDf = 4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("cos_fp")).toMap
    assert(out.contains((1L, 2L)))
    val rare = out((1L, 2L))
    val common = out.filter(_._1 != ((1L, 2L))).values
    assert(common.forall(_ < rare))
  }

  test("sourceDivergence: identical distributions → 0; disjoint → 10⁶") {
    val df = Seq(
      (1L, "x y", "A"), (2L, "x y", "B"), (3L, "z w", "C")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDivergence(df).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("tvd_num"), r.getAs[Long]("tvd_fp"))).toMap
    assert(out(("A", "B")) == ((0L, 0L)))
    assert(out(("A", "C")) == ((8L, 1000000L)))
    assert(out(("B", "C")) == ((8L, 1000000L)))
  }

  test("sourceDivergence: partial overlap lands strictly between") {
    // A = {x:2}, B = {x:1, y:1}: TVD = ½(|2/2 − 1/2| + |0 − 1/2|) = ½
    val df = Seq((1L, "x x", "A"), (2L, "x y", "B")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceDivergence(df).collect().head
    assert(r.getAs[Long]("tvd_fp") == 500000L)
  }

  test("zorderKey interleaves bits (a even, b odd)") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L), (65535L, 0L), (65535L, 65535L))
      .toDF("a", "b")
      .withColumn("z", Layout.zorderKey(col("a"), col("b")))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((3L, 0L)) == 0x5L)            // 0101
    assert(z((0L, 3L)) == 0xAL)            // 1010
    assert(z((1L, 1L)) == 0x3L)            // 0011
    assert(z((65535L, 0L)) == 0x55555555L)
    assert(z((65535L, 65535L)) == 0xFFFFFFFFL)
  }

  test("zorderArrange plans a range exchange + in-partition sort on zval") {
    val df = Seq.tabulate(100)(i => (i.toLong % 10, i.toLong / 10)).toDF("a", "b")
    val arranged = Layout.zorderArrange(df, col("a"), col("b"), numFiles = 4)
    val plan = arranged.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(zval"))
    assert(plan.toLowerCase.contains("sort"))
    // each output partition covers a contiguous z range (files prune)
    val parts = arranged.select("zval").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
      .filter(_.nonEmpty)
    val ranges = parts.map(p => (p.min, p.max)).sortBy(_._1).toSeq
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ => ()
    }
  }

  test("profile reports nulls, distincts, and native-typed min/max per column") {
    val df = Seq(
      (1L, Some(10L), "b"), (2L, Some(2L), "a"), (3L, None, "a"), (4L, Some(10L), "c")
    ).toDF("id", "v", "s")
    val out = Stats.profile(df, Seq("id" -> col("id"), "v" -> col("v"), "s" -> col("s")))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val v = out("v")
    assert(v.getAs[Long]("n_rows") == 4L && v.getAs[Long]("n_nonnull") == 3L &&
      v.getAs[Long]("n_distinct") == 2L)
    // numeric ordering, not lexicographic: min 2, max 10
    assert(v.getAs[String]("min_str") == "2" && v.getAs[String]("max_str") == "10")
    assert(out("s").getAs[String]("min_str") == "a" &&
      out("s").getAs[String]("max_str") == "c")
  }

  test("keywordScore folds the weight map per row, bias included, label at 0") {
    val df = Seq(
      (1L, "good good bad"),        // 2·2 − 3 = 1  → label 1
      (2L, "bad bad"),              // −6           → label 0
      (3L, "neutral words only"),   // 0            → label 1
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.keywordScore(df, Seq("good" -> 2L, "bad" -> -3L))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("kw_score"), r.getAs[Long]("kw_label"))).toMap
    assert(out(1L) == ((1L, 1L)))
    assert(out(2L) == ((-6L, 0L)))
    assert(out(3L) == ((0L, 1L)))
    assert(!out.contains(4L)) // null text filtered
  }

  test("splitSentences: terminators split, trailing sentence kept, indices 1-based") {
    val df = Seq(
      (1L, "one two. three four! five"),
      (2L, "no terminator here"),
      (3L, "ends with period. ")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.splitSentences(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sent_idx")) ->
        (r.getAs[String]("sentence"), r.getAs[Long]("n_tokens"))).toMap
    assert(out((1L, 1L)) == (("one two.", 2L)))
    assert(out((1L, 2L)) == (("three four!", 2L)))
    assert(out((1L, 3L)) == (("five", 1L)))
    assert(out((2L, 1L)) == (("no terminator here", 3L)))
    // ". " at end: the trailing empty segment drops, terminator kept
    assert(out((3L, 1L))._1 == "ends with period.")
    assert(!out.contains((3L, 2L)))
  }

  test("extractLinks: url+anchor pairs with target domain; docs without links yield no rows") {
    val df = Seq(
      (1L, """pre <a href="http://A.example.com/x">First</a> mid <a class="z" href="https://b.org/y?q=1">second one</a> post"""),
      (2L, "no links at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.extractLinks(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("link_idx")) ->
        (r.getAs[String]("url"), r.getAs[String]("anchor"), r.getAs[String]("target_domain")))
      .toMap
    assert(out.size == 2)
    assert(out((1L, 1L)) == (("http://A.example.com/x", "First", "a.example.com")))
    assert(out((1L, 2L)) == (("https://b.org/y?q=1", "second one", "b.org")))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with null-safe compare") {
    val oldDf = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, None: Option[Double], "C"), (4L, Some(40.0), "D")).toDF("k", "p", "s")
    val newDf = Seq((1L, Some(10.0), "A"),           // unchanged
      (2L, Some(21.0), "B"),                          // changed (value)
      (3L, Some(30.0), "C"),                          // changed (null -> value)
      (5L, Some(50.0), "E"))                          // added; 4 removed
      .toDF("k", "p", "s")
    val out = Diff.snapshotDiff(oldDf, newDf, Seq("k"), Seq("p", "s")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("fkAudit counts orphans per FK; null child keys excluded; intact FK reports zero") {
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)),
      (4L, None: Option[Long]), (5L, Some(98L))).toDF("id", "fk_key")
    val parent = Seq(10L).toDF("pk")
    val out = Integrity.fkAudit(Seq(
        ("child->parent", child, "fk_key", parent, "pk"),
        ("child->self", child, "id", child, "id")))
      .collect().map(r => r.getAs[String]("fk") ->
        (r.getAs[Long]("n_child_rows"), r.getAs[Long]("n_orphans"),
          r.getAs[Long]("n_orphan_keys"))).toMap
    assert(out("child->parent") == ((4L, 2L, 2L))) // keys 99, 98; null excluded
    assert(out("child->self") == ((5L, 0L, 0L)))
  }

  test("media sniff parses real header layouts; garbage stays 'unknown', never errors") {
    import Multimodal.SampleHeaders
    val rows = Seq(
      (1L, SampleHeaders.png), (2L, SampleHeaders.gif),
      (3L, SampleHeaders.jpeg), (4L, SampleHeaders.wav),
      (5L, Array[Byte](1, 2, 3)),                  // garbage
      (6L, Array.emptyByteArray),                  // empty
      (7L, SampleHeaders.png.take(10)),            // truncated PNG
      (8L, null.asInstanceOf[Array[Byte]])         // null payload
    ).toDF("media_id", "payload")
    val out = Multimodal.sniff(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[String]("format") == "png" &&
      out(1L).getAs[Int]("width") == 64 && out(1L).getAs[Int]("height") == 48)
    assert(out(2L).getAs[String]("format") == "gif" &&
      out(2L).getAs[Int]("width") == 320 && out(2L).getAs[Int]("height") == 200)
    assert(out(3L).getAs[String]("format") == "jpeg" &&
      out(3L).getAs[Int]("width") == 640 && out(3L).getAs[Int]("height") == 480)
    assert(out(4L).getAs[String]("format") == "wav" &&
      out(4L).getAs[Int]("sample_rate") == 8000 &&
      out(4L).getAs[Int]("channels") == 1 &&
      out(4L).getAs[Long]("duration_ms") == 1500L)
    assert(out(5L).getAs[String]("format") == "unknown" && out(5L).isNullAt(2))
    assert(out(6L).getAs[String]("format") == "unknown")
    assert(out(7L).getAs[String]("format") == "unknown") // sig incomplete ⇒ not a parseable PNG
    assert(out(8L).isNullAt(1)) // null payload ⇒ null struct fields throughout
  }

  test("rollingAnomaly flags a spike against its own recent context, integer-exact") {
    // steady 100s then a 100× spike: flag fires on the spike only;
    // a second identical spike widens the window variance enough not to
    val df = Seq(
      (1L, 1L, 100L), (1L, 2L, 101L), (1L, 3L, 99L), (1L, 4L, 100L),
      (1L, 5L, 10000L),
      (2L, 1L, 5L), (2L, 2L, 5L)  // constant series: zero spread, no flag
    ).toDF("k", "seq", "v")
    val out = Stats.rollingAnomaly(df, "k", Seq("seq"), "v", lookback = 6, k = 2)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("seq")) ->
        r.getAs[Long]("is_anomaly")).toMap
    assert(out((1L, 5L)) == 1L)
    assert(out((1L, 1L)) == 0L && out((1L, 4L)) == 0L)
    assert(out((2L, 2L)) == 0L)
  }

  test("keySkew reports the hot key and exact count percentiles") {
    // key "a" 6 rows, "b" 2, "c" 1, null excluded
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c") ++ Seq(null))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val r = Stats.keySkew(df, "key").collect().head
    assert(r.getAs[Long]("n_keys") == 3L && r.getAs[Long]("n_rows") == 9L)
    assert(r.getAs[Long]("min_cnt") == 1L && r.getAs[Long]("max_cnt") == 6L)
    assert(r.getAs[Double]("median_cnt") == 2.0)
    assert(r.getAs[String]("top_key") == "a" && r.getAs[Long]("top_cnt") == 6L)
  }

  test("nfcNormalize composes decomposed sequences; NFC input passes through") {
    val df = Seq(
      (1L, "cafe\u0301"),                       // e + COMBINING ACUTE
      (2L, "caf\u00E9"),                        // already composed
      (3L, "A\u030Angstro\u0308m"),            // decomposed ring + diaeresis
      (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = df.select(col("id"),
        graft.functions.TextMetrics.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "caf\u00E9")
    assert(out(2L) == "caf\u00E9")
    assert(out(3L) == "\u00C5ngstr\u00F6m")
    assert(out(4L) == null)
  }

  test("media sniff survives adversarial chunk sizes and JPEG fill bytes") {
    import Multimodal.SampleHeaders
    // RIFF/WAVE with chunk size 0xFFFFFFF8 — an Int truncation would
    // loop forever (step 0) or index negatively
    val evilWav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      Array(0xF8, 0xFF, 0xFF, 0xFF).map(_.toByte)
    // JPEG with spec-legal 0xFF fill bytes before the SOF marker
    val fillJpeg = Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF).map(_.toByte) ++
      SampleHeaders.jpeg.drop(8) // the SOF0 segment from the fixture
    val df = Seq((1L, evilWav), (2L, fillJpeg)).toDF("media_id", "payload")
    val out = Multimodal.sniff(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[String]("format") == "wav") // parsed, no hang/crash
    assert(out(2L).getAs[String]("format") == "jpeg" &&
      out(2L).getAs[Int]("width") == 640 && out(2L).getAs[Int]("height") == 480)
  }

  test("keySkew on an all-null key column still returns the one-row report") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "key")
    val rows = Stats.keySkew(df, "key").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_keys") == 0L)
    assert(rows.head.isNullAt(rows.head.fieldIndex("top_key")))
  }

  test("sketch rollup: weekly estimate from merged daily sketches within 5% of exact") {
    import graft.core.Tables
    val e = Tables.load(spark, sf001, "events")
    // q115's surface encodes the accuracy gate itself: est_ok = 1 ⟺ the
    // sketch-union estimate is within 5% of exact. Assert every week is
    // in-band AND the exact side agrees with an independent countDistinct.
    val rows = graft.queries.Audit.q115_sketch_rollup(spark, sf001)
      .select("week_ms", "exact_week_users", "est_ok").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("exact_week_users"), r.getAs[Int]("est_ok"))))
      .toMap
    val exact = e.groupBy(unix_millis(date_trunc("week", col("ts"))).as("wms"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
    assert(rows.keySet == exact.keySet && rows.nonEmpty)
    for ((w, (ex, ok)) <- rows) {
      assert(ex == exact(w), s"week $w: exact $ex vs independent ${exact(w)}")
      assert(ok == 1, s"week $w: sketch estimate out of 5% band")
    }
  }

  test("columnDrift: identical snapshots → 0; disjoint supports → 10⁶") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = Seq(1L, 1L, 2L, 3L).toDF("v")
    val c = Seq(9L, 9L, 8L, 7L).toDF("v")
    val same = Diff.columnDrift(a, b, "v").collect().head
    assert(same.getAs[Long]("tvd_num") == 0L && same.getAs[Long]("tvd_fp") == 0L)
    val disj = Diff.columnDrift(a, c, "v").collect().head
    assert(disj.getAs[Long]("tvd_fp") == 1000000L)
    assert(disj.getAs[Long]("n_values") == 6L)
  }

  test("keywordScore plans shuffle-free (no exchange)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.keywordScore(df, Seq("a" -> 1L))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"))
  }
}
