package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declarative data-quality expectations — the validation gate a pipeline
  * runs before promoting a batch (the Great-Expectations pattern as a
  * plan, not a framework): each check yields one report row
  * `(check_name, n_rows, n_violations, pass)`, all exact integers.
  *
  * Scale shape: every ROW-level check (null rate, range, regex, custom
  * predicate) folds into ONE aggregate pass over the table — |checks|
  * conditional sums in a single partial-aggregated scan, no shuffle of
  * row data. Each UNIQUENESS check needs its own key shuffle (that is
  * what uniqueness means distributively), but aggregates to per-key
  * counts map-side first; its violation count is Σ(cnt−1) over
  * duplicated keys = rows − distinct keys. Referential checks live in
  * [[Integrity.fkAudit]].
  */
object Expectations {

  /** Violation predicate: value present but outside [lo, hi]. */
  def inRange(c: Column, lo: Column, hi: Column): Column =
    c.isNotNull && (c < lo || c > hi)

  /** Violation predicate: value null. */
  def notNull(c: Column): Column = c.isNull

  /** Violation predicate: value present but not fully matching `re`
    * (Java regex, anchored via rlike on ^...$ being the caller's call). */
  def matches(c: Column, re: String): Column = c.isNotNull && !c.rlike(re)

  /** Run row-level violation predicates (one scan, zero shuffles of row
    * data) and uniqueness checks (one key shuffle each) over `df`.
    * `rowChecks`: (check_name, violation predicate). `uniqueChecks`:
    * (check_name, key columns) — a null key counts as a value (two
    * all-null keys duplicate each other), matching SQL GROUP BY. */
  def audit(df: DataFrame, rowChecks: Seq[(String, Column)],
      uniqueChecks: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty, "no checks given")
    require((rowChecks.map(_._1) ++ uniqueChecks.map(_._1)).distinct.size ==
      rowChecks.size + uniqueChecks.size, "check names must be unique")
    // names become internal column names; keep them resolver-safe
    require(rowChecks.map(_._1).forall(_.matches("[A-Za-z0-9_]+")),
      "check names must be [A-Za-z0-9_]+")
    def report(name: String, nRows: Column, nViol: Column): Seq[Column] = Seq(
      lit(name).as("check_name"), nRows.as("n_rows"), nViol.as("n_violations"),
      when(nViol === 0, lit(1L)).otherwise(lit(0L)).as("pass"))
    val rowPart: Option[DataFrame] = Option(rowChecks).filter(_.nonEmpty).map { cs =>
      val aggs = cs.map { case (n, pred) =>
        sum(when(pred, lit(1L)).otherwise(lit(0L))).as(s"__ex_$n") }
      val wide = df.agg(count(lit(1)).as("__ex_rows"), aggs: _*)
      // explode the single wide row into one report row per check
      wide.select(explode(array(cs.map { case (n, _) =>
        struct(report(n, col("__ex_rows"),
          coalesce(col(s"__ex_$n"), lit(0L))): _*)
      }: _*)).as("r")).select(col("r.*"))
    }
    val uniqueParts: Seq[DataFrame] = uniqueChecks.map { case (n, keys) =>
      val perKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__ex_cnt"))
      perKey.agg(sum(col("__ex_cnt")).as("__r"),
          (sum(col("__ex_cnt")) - count(lit(1))).as("__v"))
        .select(report(n,
          coalesce(col("__r"), lit(0L)).cast(LongType),
          coalesce(col("__v"), lit(0L)).cast(LongType)): _*)
    }
    (rowPart.toSeq ++ uniqueParts).reduce(_ unionByName _)
  }
}
