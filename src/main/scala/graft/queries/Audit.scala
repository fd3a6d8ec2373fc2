package graft.queries

import graft.core.Tables
import graft.ext.{Layout, Search, Stats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 corpus-audit operators as oracle-checked queries: weighted
  * (tf·idf) sparse-cosine near-dup pairs (q96), pairwise source
  * distribution divergence (q97), the z-order layout key (q98), one-pass
  * column profiling (q99), linear keyword-classifier scoring (q100), and
  * the lag/lead/first/last analytic-function family (q101).
  *
  * Shares the oracle discipline of [[Corpus]]/[[Curation]]: integer or
  * fixed-point scores, mirrored IEEE expression trees, total output
  * orders.
  */
object Audit {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // --------------------------------------------------------------------------
  // q96 — tf·idf sparse-cosine near-dup pairs: cosine ≥ 0.7 over integer
  // tf·idf term vectors on the df-capped vocabulary. The planted copy
  // groups score 10⁶; naturally word-overlapping docs sit below threshold
  // unless they share DISTINCTIVE (low-df) vocabulary — the weighting
  // Jaccard lacks. Membership decided in exact integer arithmetic.
  def q96_tfidf_cosine_pairs(s: SparkSession, dir: String): DataFrame =
    Search.tfidfCosinePairs(docs(s, dir), minCosNum = 7, minCosDen = 10,
        maxDf = 100)
      .orderBy(col("doc_a"), col("doc_b"))

  private val q96_sql =
    Search.tfidfCosinePairsOracleSql("documents", minCosNum = 7,
      minCosDen = 10, maxDf = 100)

  // --------------------------------------------------------------------------
  // q97 — source distribution divergence: pairwise total-variation
  // distance between per-source unigram distributions (190 pairs at 20
  // sources). Exact integer numerator; one mirrored IEEE division for
  // the fixed-point report.
  def q97_source_divergence(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceDivergence(docs(s, dir))
      .orderBy(col("source_a"), col("source_b"))

  private val q97_sql =
    """WITH tok AS (
      |  SELECT source,
      |    CAST(('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15)) AS BIGINT) AS gk
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT source, gk, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
      |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok FROM c GROUP BY 1),
      |cw AS (SELECT c.source, c.gk, c.c, t.n_tok FROM c JOIN t USING (source)),
      |sh AS (SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(sum(abs(a.c * b.n_tok - b.c * a.n_tok)) AS BIGINT) AS shared_abs,
      |         CAST(sum(a.c) AS BIGINT) AS shared_ca,
      |         CAST(sum(b.c) AS BIGINT) AS shared_cb
      |       FROM cw a JOIN cw b ON a.gk = b.gk AND a.source < b.source
      |       GROUP BY 1, 2),
      |m AS (SELECT x.source AS source_a, y.source AS source_b,
      |        x.n_tok AS n_a, y.n_tok AS n_b,
      |        coalesce(sh.shared_abs, 0)
      |          + (x.n_tok - coalesce(sh.shared_ca, 0)) * y.n_tok
      |          + (y.n_tok - coalesce(sh.shared_cb, 0)) * x.n_tok AS tvd_num
      |      FROM t x JOIN t y ON x.source < y.source
      |      LEFT JOIN sh ON sh.source_a = x.source AND sh.source_b = y.source)
      |SELECT source_a, source_b, n_a, n_b, CAST(tvd_num AS BIGINT) AS tvd_num,
      |  CAST(floor(CAST(tvd_num AS DOUBLE) * 1000000.0 /
      |    (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS BIGINT) AS tvd_fp
      |FROM m ORDER BY source_a, source_b""".stripMargin

  // --------------------------------------------------------------------------
  // q98 — z-order (Morton) layout key: interleave the low 16 bits of the
  // bucketed (l_partkey, l_suppkey) pair — the write-time clustering key
  // that keeps parquet min/max tight on BOTH columns (Layout.zorderArrange
  // range-partitions and sorts by it; the key math is what the oracle
  // checks).
  def q98_zorder_key(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"),
        pmod(col("l_partkey"), lit(65536L)).as("pa"),
        pmod(col("l_suppkey"), lit(65536L)).as("pb"))
      .withColumn("zval", Layout.zorderKey(col("pa"), col("pb")))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q98_sql =
    s"""WITH p AS (
       |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |    l_partkey % 65536 AS pa, l_suppkey % 65536 AS pb
       |  FROM lineitem)
       |SELECT l_orderkey, l_linenumber, pa, pb,
       |  CAST(${Layout.zorderSqlExpr("pa", "pb")} AS BIGINT) AS zval
       |FROM p ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --------------------------------------------------------------------------
  // q99 — one-pass column profiling of `orders`: per-column null/distinct
  // counts and native-typed min/max (dates as dates, prices as exact
  // cents — never lexicographic).
  def q99_profile(s: SparkSession, dir: String): DataFrame =
    Stats.profile(Tables.load(s, dir, "orders"), Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_orderpriority" -> col("o_orderpriority"),
        "o_orderdate" -> to_date(col("o_orderdate")),
        "o_totalprice_cents" -> floor(col("o_totalprice") * lit(100.0)).cast(LongType)))
      .orderBy(col("column_name"))

  private val q99_sql = {
    def block(name: String, expr: String) =
      s"""SELECT '$name' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count($expr) AS BIGINT) AS n_nonnull,
         |  CAST(count(DISTINCT $expr) AS BIGINT) AS n_distinct,
         |  CAST(min($expr) AS VARCHAR) AS min_str,
         |  CAST(max($expr) AS VARCHAR) AS max_str FROM orders""".stripMargin
    Seq(
      block("o_orderkey", "o_orderkey"),
      block("o_custkey", "o_custkey"),
      block("o_orderstatus", "o_orderstatus"),
      block("o_orderpriority", "o_orderpriority"),
      block("o_orderdate", "CAST(o_orderdate AS DATE)"),
      block("o_totalprice_cents", "CAST(floor(o_totalprice * 100.0) AS BIGINT)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // --------------------------------------------------------------------------
  // q100 — keyword-classifier inference: integer weights over the corpus
  // vocabulary, folded per row from a map literal (no shuffle). The
  // weight mix spans the score distribution across zero so the label
  // genuinely decides.
  private val KwWeights: Seq[(String, Long)] = Seq(
    "fast" -> 3L, "spark" -> 2L, "join" -> 1L, "merge" -> 1L,
    "slow" -> -3L, "batch" -> -1L, "scan" -> -1L, "the" -> -2L)

  def q100_keyword_score(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.keywordScore(docs(s, dir), KwWeights)
      .select(col("doc_id"), col("kw_score"), col("kw_label"))
      .orderBy(col("doc_id"))

  private val q100_sql = {
    val values = KwWeights.map { case (w, v) => s"('$w', $v)" }.mkString(", ")
    s"""WITH w(term, wt) AS (VALUES $values),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents WHERE text IS NOT NULL),
       |s AS (SELECT t.doc_id, CAST(sum(w.wt) AS BIGINT) AS sc
       |      FROM tok t JOIN w ON t.tok = w.term GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(s.sc, 0) AS BIGINT) AS kw_score,
       |  CAST(CASE WHEN coalesce(s.sc, 0) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS kw_label
       |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
       |WHERE d.text IS NOT NULL ORDER BY d.doc_id""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q101 — the lag/lead/first/last analytic family (the frame-navigation
  // complement to q71's rank family): per-customer order history with
  // days-since-previous-order, the next order's key, and the first/last
  // order keys under the (date, key) total order.
  def q101_order_gaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast(LongType).as("gap_days"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(wf).as("last_key"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private val q101_sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(date_diff('day',
      |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days,
      |  lead(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS next_key,
      |  first_value(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS first_key,
      |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // --------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_tfidf_cosine_pairs" -> (q96_tfidf_cosine_pairs _),
    "q97_source_divergence" -> (q97_source_divergence _),
    "q98_zorder_key" -> (q98_zorder_key _),
    "q99_profile" -> (q99_profile _),
    "q100_keyword_score" -> (q100_keyword_score _),
    "q101_order_gaps" -> (q101_order_gaps _))

  def oracle: Map[String, String] = Map(
    "q96_tfidf_cosine_pairs" -> q96_sql,
    "q97_source_divergence" -> q97_sql,
    "q98_zorder_key" -> q98_sql,
    "q99_profile" -> q99_sql,
    "q100_keyword_score" -> q100_sql,
    "q101_order_gaps" -> q101_sql)
}
