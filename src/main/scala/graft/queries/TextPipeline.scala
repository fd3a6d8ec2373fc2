package graft.queries

import graft.core.Tables
import graft.operators.{PipeOp, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity text operators (SURVEY.md §2.2) exercised as oracle-
  * checked queries over the `documents` table: noop, literal replace, global
  * regex replace, regex split (fan-out), regex select (match extraction),
  * and the external-process pipe.
  *
  * Regex patterns are kept in the Java∩RE2 common dialect so the DuckDB
  * oracle runs the *same pattern*; substitution strings differ by engine
  * syntax only (Java `$1` vs RE2 `\1`), and DuckDB gets the 'g' flag to
  * match Spark's always-global regexp_replace.
  */
object TextPipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // --------------------------------------------------------------------------
  // q26 — noop: the identity processor (src/processors.rs:11-19). The plan is
  // a bare scan+sort; its value is contractual (spec compiler emits it).
  def q26_noop(s: SparkSession, dir: String): DataFrame =
    TextOps.noop(docs(s, dir))
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  private val q26_sql =
    "SELECT doc_id, text FROM documents ORDER BY doc_id"

  // --------------------------------------------------------------------------
  // q27 — literal replace, all occurrences (src/processors.rs:21-50).
  def q27_replace(s: SparkSession, dir: String): DataFrame =
    TextOps.replaceLiteral(docs(s, dir), "text", "data", "info")
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  private val q27_sql =
    "SELECT doc_id, replace(text, 'data', 'info') AS text FROM documents ORDER BY doc_id"

  // --------------------------------------------------------------------------
  // q28 — global regex replace with group substitution (src/regex.rs:10-40):
  // swap each adjacent word pair. Left-to-right non-overlapping scan is
  // identical in Java regex and RE2.
  def q28_regex_replace(s: SparkSession, dir: String): DataFrame =
    TextOps.regexReplace(docs(s, dir), "text", """([a-z]+) ([a-z]+)""", "$2 $1")
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  private val q28_sql =
    """SELECT doc_id,
      | regexp_replace(text, '([a-z]+) ([a-z]+)', '\2 \1', 'g') AS text
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q29 — regex split with fan-out (src/regex.rs:96-132): one row per token,
  // position preserved, empty segments kept (limit=-1 = Rust split contract).
  def q29_regex_split(s: SparkSession, dir: String): DataFrame =
    TextOps.regexSplit(docs(s, dir).select(col("doc_id"), col("text")), "text", " ",
        segCol = "token", posCol = "pos")
      .orderBy(col("doc_id"), col("pos"))

  private val q29_sql =
    """SELECT doc_id,
      | CAST(unnest(list_transform(string_split(text, ' '), (x, i) -> i - 1)) AS INT) AS pos,
      | unnest(string_split(text, ' ')) AS token
      |FROM documents ORDER BY doc_id, pos""".stripMargin

  // --------------------------------------------------------------------------
  // q30 — regex select (src/regex.rs:181-217): every non-overlapping match of
  // a pattern becomes its own row; rows without matches disappear.
  def q30_regex_select(s: SparkSession, dir: String): DataFrame =
    TextOps.regexSelect(docs(s, dir).select(col("doc_id"), col("text")), "text",
        "[a-z]{6,}", matchCol = "word", posCol = "pos")
      .orderBy(col("doc_id"), col("pos"))

  private val q30_sql =
    """SELECT doc_id,
      | CAST(unnest(list_transform(regexp_extract_all(text, '[a-z]{6,}'), (x, i) -> i - 1)) AS INT) AS pos,
      | unnest(regexp_extract_all(text, '[a-z]{6,}')) AS word
      |FROM documents ORDER BY doc_id, pos""".stripMargin

  // --------------------------------------------------------------------------
  // q31 — external-process pipe (src/processors.rs:101-152): each partition's
  // rows stream through one awk child ("doc_id<TAB>text" in, "doc_id<TAB>
  // wordcount" out), exactly the reference's own awk fixture pattern
  // (src/processors.rs:172-200). Keyed framing makes the fan-in joinable and
  // order-free; the oracle recomputes the word count relationally.
  def q31_pipe_wordcount(s: SparkSession, dir: String): DataFrame = {
    val keyed = docs(s, dir)
      .select(concat_ws("\t", col("doc_id"), col("text")).as("line"))
    val piped = PipeOp.pipe(keyed, "line",
      Seq("awk", "{print $1 \"\\t\" (NF-1)}"))
    piped
      .select(
        split(col("line"), "\t").getItem(0).cast(LongType).as("doc_id"),
        split(col("line"), "\t").getItem(1).cast(LongType).as("n_words"))
      .orderBy(col("doc_id"))
  }

  // awk's default FS counts runs of whitespace as one separator and ignores
  // leading/trailing blanks, so the oracle counts NON-EMPTY space-split
  // tokens (also 0 for empty text, matching NF-1 = 0). Framing assumes the
  // text column has no tabs/newlines (true of the fixtures; a general corpus
  // would escape them before piping).
  private val q31_sql =
    """SELECT doc_id,
      | CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_noop" -> (q26_noop _),
    "q27_replace" -> (q27_replace _),
    "q28_regex_replace" -> (q28_regex_replace _),
    "q29_regex_split" -> (q29_regex_split _),
    "q30_regex_select" -> (q30_regex_select _),
    "q31_pipe_wordcount" -> (q31_pipe_wordcount _)
  )

  def oracle: Map[String, String] = Map(
    "q26_noop" -> q26_sql,
    "q27_replace" -> q27_sql,
    "q28_regex_replace" -> q28_sql,
    "q29_regex_split" -> q29_sql,
    "q30_regex_select" -> q30_sql,
    "q31_pipe_wordcount" -> q31_sql
  )
}
