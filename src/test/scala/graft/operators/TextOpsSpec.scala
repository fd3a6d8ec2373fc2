package graft.operators

import graft.SparkSpec
import graft.core.{Message, Model}
import org.apache.spark.sql.functions._

/** Ports the reference's operator unit fixtures verbatim (SURVEY.md §5;
  * citations into /root/reference per test). */
class TextOpsSpec extends SparkSpec {

  private def texts(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("batch_id").select("text").collect().map(_.getString(0)).toSeq

  test("noop is identity (src/processors.rs:11-19)") {
    val in = Model.fromLines(spark, Seq("a", "b"))
    assert(texts(TextOps.noop(in.toDF())) == Seq("a", "b"))
  }

  test("replace: cheese|geese -> choose|goose (src/processors.rs:70-98)") {
    val in = Model.fromLines(spark, Seq("cheese", "geese")).toDF()
    val out = TextOps.replaceLiteral(in, "text", "ee", "oo")
    assert(texts(out) == Seq("choose", "goose"))
  }

  test("replace across 2 batches preserves batch ids (src/processors.rs:84-98)") {
    val in = Model.toDF(spark, Seq(
      Message("cheese", Map.empty, 0L), Message("geese", Map.empty, 1L))).toDF()
    val out = TextOps.replaceLiteral(in, "text", "ee", "oo")
      .orderBy("batch_id").collect()
    assert(out.map(r => (r.getAs[String]("text"), r.getAs[Long]("batch_id"))).toSeq ==
      Seq(("choose", 0L), ("goose", 1L)))
  }

  test("regex_replace: named-group date reformat (src/regex.rs:61-93)") {
    val in = Model.fromLines(spark,
      Seq("2012-03-14, 2013-01-15 and 2014-07-05")).toDF()
    // reference pattern with Rust $name substitution, translated
    val rep = TextOps.translateSubst("$m/$d/$y")
    assert(rep == "${m}/${d}/${y}")
    val out = TextOps.regexReplace(in, "text",
      """(?<y>\d{4})-(?<m>\d{2})-(?<d>\d{2})""", rep)
    assert(texts(out) == Seq("03/14/2012, 01/15/2013 and 07/05/2014"))
  }

  test("regex_split on whitespace (src/regex.rs:152-178)") {
    val in = Model.fromLines(spark, Seq("cheese\tcheese")).toDF()
    val out = TextOps.regexSplit(in, "text", "[ \\t]+", segCol = "seg")
    assert(out.orderBy("pos").select("seg").collect().map(_.getString(0)).toSeq ==
      Seq("cheese", "cheese"))
  }

  test("regex_split keeps empty trailing segments (Rust split contract)") {
    val in = Model.fromLines(spark, Seq("a,b,")).toDF()
    val out = TextOps.regexSplit(in, "text", ",", segCol = "seg")
    assert(out.orderBy("pos").select("seg").collect().map(_.getString(0)).toSeq ==
      Seq("a", "b", ""))
  }

  test("regex_select extracts hashtags, drops non-matches (src/regex.rs:237-263)") {
    val in = Model.fromLines(spark,
      Seq("hello #cheese #world", "no tags here")).toDF()
    val out = TextOps.regexSelect(in, "text", """#[a-zA-Z][0-9a-zA-Z_]*""", matchCol = "m")
    assert(out.orderBy("batch_id", "pos").select("m").collect().map(_.getString(0)).toSeq ==
      Seq("#cheese", "#world"))
  }

  test("fan-out ops drop metadata (src/regex.rs:117-120)") {
    val in = Model.toDF(spark, Seq(Message("a b", Map("k" -> "v"), 0L))).toDF()
    val out = TextOps.regexSplit(in, "text", " ")
    assert(!out.columns.contains("metadata"))
  }

  test("pipe through cat round-trips lines (src/processors.rs:101-152)") {
    val in = Model.fromLines(spark, Seq("hello", "world")).toDF()
    val out = PipeOp.pipe(in, "text", Seq("cat"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("hello", "world"))
  }

  test("pipe through awk splits like reference fixture (src/processors.rs:172-200)") {
    val in = Model.fromLines(spark, Seq("hello,world,cheese")).toDF()
    val out = PipeOp.pipe(in, "text",
      Seq("awk", "-v", "RS=[,\\n]", "{print $0}"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("cheese", "hello", "world"))
  }
}
