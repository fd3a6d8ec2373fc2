package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's processor set (SURVEY.md §2.2), re-expressed as pure
  * Column-expression DataFrame transforms — every one whole-stage-codegen'd
  * by Catalyst, no UDFs.
  *
  * Reference semantics ported (citations into /root/reference):
  *   - noop          — identity                       (src/processors.rs:11-19)
  *   - replace       — literal substring replace, all occurrences
  *                     (src/processors.rs:21-50)
  *   - regexReplace  — Regex::replace_all             (src/regex.rs:10-40)
  *   - regexSplit    — Regex::split keeping empty segments, fan-out 1→k
  *                     (src/regex.rs:96-132; limit=-1 matches Rust split)
  *   - regexSelect   — find_iter: each non-overlapping match → one row,
  *                     non-matching text discarded    (src/regex.rs:181-217)
  *
  * Regex dialect note (SURVEY.md §7.4): the reference uses Rust `regex`
  * (no backrefs/lookaround), a strict subset of Java regex, so any
  * reference-legal pattern runs unchanged here. Substitution strings use
  * Java `$1`/`${name}` syntax; [[translateSubst]] converts the Rust
  * `$name` form (the reference's `$m/$d/$y` fixture) to `${name}`.
  *
  * Fan-out operators (split/select) DROP the metadata column when present,
  * matching the reference, which rebuilds messages with default metadata
  * (src/regex.rs:117-120).
  */
object TextOps {

  /** Identity processor. */
  def noop(df: DataFrame): DataFrame = df

  /** Literal (non-regex) global substring replacement on `textCol`. */
  def replaceLiteral(df: DataFrame, textCol: String, from: String, to: String): DataFrame =
    df.withColumn(textCol, replace(col(textCol), lit(from), lit(to)))

  /** Global regex replacement; `rep` in Java substitution syntax. */
  def regexReplace(df: DataFrame, textCol: String, re: String, rep: String): DataFrame =
    df.withColumn(textCol, regexp_replace(col(textCol), re, rep))

  /** Rust `$name` → Java `${name}` substitution-string translation. */
  def translateSubst(rustRep: String): String =
    rustRep.replaceAll("""\$([A-Za-z_][A-Za-z0-9_]*)""", """\$\{$1\}""")

  /** Split each row's text on `re` into one row per segment, keeping empty
    * segments (limit = -1, the Rust `Regex::split` contract). Emits
    * `segCol` plus `posCol` (0-based segment index within the source row).
    */
  def regexSplit(df: DataFrame, textCol: String, re: String,
      segCol: String = "segment", posCol: String = "pos"): DataFrame =
    df.drop("metadata")
      .select(col("*"), posexplode(split(col(textCol), re, -1)).as(Seq(posCol, segCol)))
      .drop(textCol)

  /** Every non-overlapping match of `re` becomes its own row; rows with no
    * match vanish (explode of an empty array). */
  def regexSelect(df: DataFrame, textCol: String, re: String,
      matchCol: String = "match", posCol: String = "pos"): DataFrame =
    df.drop("metadata")
      .select(col("*"), posexplode(regexp_extract_all(col(textCol), lit(re), lit(0))).as(Seq(posCol, matchCol)))
      .drop(textCol)
}
