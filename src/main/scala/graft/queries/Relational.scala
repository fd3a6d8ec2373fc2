package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator coverage over the TPC-H-ish testdata (SURVEY.md §2.4):
  * scans, filters/projections, joins, aggregations, windows, sorts, set ops.
  * Each query has a DuckDB oracle in [[Relational.oracle]]; column names are
  * aliased identically on both sides (the driver sorts columns by name before
  * hashing).
  *
  * Scale notes are attached per query: the testdata is small, but each plan is
  * shaped the way it should be at 100 TB (broadcast the dims, partial aggs
  * before shuffle, no driver-side loops).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q01 — TPC-H Q1-style pricing summary. Pure scan + partial/final hash
    * aggregate; Catalyst does map-side combine, so the shuffle carries only
    * |groups| x partitions rows regardless of input size. */
  def q01_pricing_summary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsumN(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        dsumN(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 8).as("sum_charge"),
        davg2(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01_sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(27,8))) AS DOUBLE) AS sum_charge,
      | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS DOUBLE) AS avg_qty,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** All (name -> query fn) pairs this module contributes. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01_pricing_summary _)
  )

  /** DuckDB oracle SQL per query name. */
  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01_sql
  )
}
