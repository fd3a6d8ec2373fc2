package graft.queries

import graft.core.Tables
import graft.ext.{Bpe, Diff, Integrity, Layout, Search, Stats, TextAnalysis}
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
      |         sum(abs(CAST(a.c AS HUGEINT) * b.n_tok
      |                 - CAST(b.c AS HUGEINT) * a.n_tok)) AS shared_abs,
      |         CAST(sum(a.c) AS BIGINT) AS shared_ca,
      |         CAST(sum(b.c) AS BIGINT) AS shared_cb
      |       FROM cw a JOIN cw b ON a.gk = b.gk AND a.source < b.source
      |       GROUP BY 1, 2),
      |m AS (SELECT x.source AS source_a, y.source AS source_b,
      |        x.n_tok AS n_a, y.n_tok AS n_b,
      |        coalesce(sh.shared_abs, 0)
      |          + CAST(x.n_tok - coalesce(sh.shared_ca, 0) AS HUGEINT) * y.n_tok
      |          + CAST(y.n_tok - coalesce(sh.shared_cb, 0) AS HUGEINT) * x.n_tok AS tvd_num
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
  // q102 — sentence segmentation: planted terminators (". " via ' table ',
  // "! " via ' fast ' — both frequent corpus words) split each doc into
  // sentences with 1-based indices and per-sentence token counts.
  def q102_sentences(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        replace(replace(col("text"),
          lit(" table "), lit(". Table ")), lit(" fast "), lit("! Fast ")).as("text"))
    TextAnalysis.splitSentences(planted)
      .orderBy(col("doc_id"), col("sent_idx"))
  }

  private val q102_sql =
    """WITH p AS (
      |  SELECT doc_id,
      |    replace(replace(text, ' table ', '. Table '), ' fast ', '! Fast ') AS text
      |  FROM documents WHERE text IS NOT NULL),
      |m AS (SELECT doc_id,
      |        string_split(regexp_replace(text, '([.!?]) +', '\1' || chr(31), 'g'),
      |          chr(31)) AS ss
      |      FROM p),
      |e AS (SELECT doc_id, unnest(ss) AS sentence,
      |        generate_subscripts(ss, 1) AS sent_idx FROM m)
      |SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, sentence,
      |  CAST(len(string_split(sentence, ' ')) AS BIGINT) AS n_tokens
      |FROM e WHERE sentence <> '' ORDER BY doc_id, sent_idx""".stripMargin

  // --------------------------------------------------------------------------
  // q103 — hyperlink extraction: planted anchors (1–2 links per doc across
  // 7 target hosts) come back as (url, anchor, target_domain) rows.
  def q103_extract_links(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val planted = docs(s, dir).filter(col("text").isNotNull)
      .select(id, concat(
        lit("<a href=\"http://site"), pmod(id, lit(7L)).cast(StringType),
        lit(".example.com/p\">go "), pmod(id, lit(5L)).cast(StringType),
        lit("</a> "),
        when(pmod(id, lit(2L)) === 0, concat(
          lit("<a href=\"https://site"), pmod(id + 1, lit(7L)).cast(StringType),
          lit(".example.com/x\">More Stuff</a> "))).otherwise(lit("")),
        col("text")).as("text"))
    TextAnalysis.extractLinks(planted)
      .orderBy(col("doc_id"), col("link_idx"))
  }

  private val q103_sql =
    """WITH p AS (
      |  SELECT doc_id,
      |    '<a href="http://site' || CAST(doc_id % 7 AS VARCHAR) ||
      |    '.example.com/p">go ' || CAST(doc_id % 5 AS VARCHAR) || '</a> ' ||
      |    (CASE WHEN doc_id % 2 = 0
      |          THEN '<a href="https://site' || CAST((doc_id + 1) % 7 AS VARCHAR) ||
      |               '.example.com/x">More Stuff</a> '
      |          ELSE '' END) || text AS text
      |  FROM documents WHERE text IS NOT NULL),
      |x AS (SELECT doc_id,
      |        regexp_extract_all(text, '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1) AS u,
      |        regexp_extract_all(text, '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2) AS a
      |      FROM p),
      |e AS (SELECT doc_id, generate_subscripts(u, 1) AS i, u, a FROM x)
      |SELECT doc_id, CAST(i AS BIGINT) AS link_idx, u[i] AS url, a[i] AS anchor,
      |  lower(regexp_extract(u[i], '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS target_domain
      |FROM e ORDER BY doc_id, link_idx""".stripMargin

  // --------------------------------------------------------------------------
  // q104 — per-source quality scorecard: doc/token counts, fixed-point
  // quality-score sum and integer-division mean, short-doc rate. The
  // per-doc score is q33's exact expression, floored to integer BEFORE
  // aggregation so every sum is order-free.
  def q104_source_scorecard(s: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityScore(docs(s, dir).filter(col("text").isNotNull))
    q.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_total"),
        sum(floor(col("quality_score") * lit(1000000000.0)).cast(LongType))
          .as("sum_q_fp"),
        sum(when(col("n_tokens") < 30, lit(1L)).otherwise(lit(0L))).as("n_short"))
      .withColumn("mean_q_fp",
        call_function("div", col("sum_q_fp"), col("n_docs")).cast(LongType))
      .withColumn("short_pct_fp",
        call_function("div", col("n_short") * lit(1000000L), col("n_docs"))
          .cast(LongType))
      .orderBy(col("source"))
  }

  private val q104_sql = {
    val qExpr =
      """((CAST(len(list_filter(string_split(text,' '),
        |     x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE)) * 0.4)
        |  + ((greatest(0.0, 1.0 - abs((CAST(length(replace(text,' ','')) AS DOUBLE)
        |       / CAST(len(string_split(text,' ')) AS DOUBLE)) - 5.0) / 5.0)) * 0.4)
        |  + (least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.2)""".stripMargin
    s"""WITH d AS (
       |  SELECT source, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    CAST(floor(($qExpr) * 1000000000.0) AS BIGINT) AS q_fp
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
       |  CAST(sum(q_fp) AS BIGINT) AS sum_q_fp,
       |  CAST(sum(CASE WHEN n_tokens < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       |  CAST(sum(q_fp) // count(*) AS BIGINT) AS mean_q_fp,
       |  CAST((sum(CASE WHEN n_tokens < 30 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS short_pct_fp
       |FROM d GROUP BY source ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q105 — snapshot diff: a planted "today" snapshot of orders (every
  // 97th key removed, every 13th repriced, every 101st re-added under a
  // shifted key) diffs against the original; only the delta survives.
  private def plantedNewOrders(o: DataFrame): DataFrame = {
    val base = o.filter(pmod(col("o_orderkey"), lit(97L)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(13L)) === 0,
          col("o_totalprice") + lit(1.0)).otherwise(col("o_totalprice")))
    val added = o.filter(pmod(col("o_orderkey"), lit(101L)) === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    base.unionByName(added)
  }

  def q105_snapshot_diff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    Diff.snapshotDiff(o, plantedNewOrders(o),
        keys = Seq("o_orderkey"), compare = Seq("o_totalprice", "o_orderstatus"))
      .filter(col("change_type") =!= "unchanged")
      .orderBy(col("o_orderkey"))
  }

  private val q105_sql =
    """WITH n AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |        o.o_totalprice AS old_p, n.o_totalprice AS new_p,
      |        o.o_orderstatus AS old_s, n.o_orderstatus AS new_s,
      |        o.o_orderkey IS NULL AS no_old, n.o_orderkey IS NULL AS no_new
      |      FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
      |SELECT o_orderkey,
      |  CASE WHEN no_old THEN 'added' WHEN no_new THEN 'removed'
      |       WHEN old_p IS DISTINCT FROM new_p
      |         OR old_s IS DISTINCT FROM new_s THEN 'changed'
      |       ELSE 'unchanged' END AS change_type,
      |  old_p AS old_o_totalprice, new_p AS new_o_totalprice,
      |  old_s AS old_o_orderstatus, new_s AS new_o_orderstatus
      |FROM j
      |WHERE (CASE WHEN no_old THEN 'added' WHEN no_new THEN 'removed'
      |       WHEN old_p IS DISTINCT FROM new_p
      |         OR old_s IS DISTINCT FROM new_s THEN 'changed'
      |       ELSE 'unchanged' END) <> 'unchanged'
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q106 — referential-integrity audit: three FKs in one report; the
  // orders parent is planted with every 50th key missing so the first FK
  // genuinely finds orphans while the intact FKs report zero.
  def q106_fk_audit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val orders = Tables.load(s, dir, "orders")
    val plantedOrders = orders.filter(pmod(col("o_orderkey"), lit(50L)) =!= 0)
    Integrity.fkAudit(Seq(
        ("lineitem.l_orderkey->orders[planted]", li, "l_orderkey",
          plantedOrders, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey"),
        ("orders.o_custkey->customer", orders, "o_custkey",
          Tables.load(s, dir, "customer"), "c_custkey")))
      .orderBy(col("fk"))
  }

  private val q106_sql =
    """WITH po AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 50 <> 0),
      |c1 AS (SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey IS NOT NULL),
      |o1 AS (SELECT k FROM c1 WHERE NOT EXISTS (SELECT 1 FROM po WHERE po.o_orderkey = c1.k)),
      |c2 AS (SELECT l_partkey AS k FROM lineitem WHERE l_partkey IS NOT NULL),
      |o2 AS (SELECT k FROM c2 WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = c2.k)),
      |c3 AS (SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL),
      |o3 AS (SELECT k FROM c3 WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = c3.k))
      |SELECT 'lineitem.l_orderkey->orders[planted]' AS fk,
      |  (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n_child_rows,
      |  CAST(count(*) AS BIGINT) AS n_orphans,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys FROM o1
      |UNION ALL
      |SELECT 'lineitem.l_partkey->part',
      |  (SELECT CAST(count(*) AS BIGINT) FROM c2),
      |  CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT) FROM o2
      |UNION ALL
      |SELECT 'orders.o_custkey->customer',
      |  (SELECT CAST(count(*) AS BIGINT) FROM c3),
      |  CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT) FROM o3
      |ORDER BY fk""".stripMargin

  // --------------------------------------------------------------------------
  // q107/q108 — BPE vocabulary training + tokenization. No SQL engine
  // expresses the training recursion → rows-only by design; the merge
  // semantics are gated by the hand-computed Sennrich-style fixture in
  // BpeSpec. q107 emits the learned merge table from a deterministic
  // doc subsample; q108 retrains and tokenizes the full corpus.
  private val BpeMerges = 20

  def q107_bpe_merges(s: SparkSession, dir: String): DataFrame =
    Bpe.trainDf(s, docs(s, dir).filter(pmod(col("doc_id"), lit(5L)) === 0),
        nMerges = BpeMerges)
      .orderBy(col("rank"))

  def q108_bpe_tokenize(s: SparkSession, dir: String): DataFrame = {
    val sample = docs(s, dir).filter(pmod(col("doc_id"), lit(5L)) === 0)
    val merges = Bpe.train(sample, nMerges = BpeMerges)
      .map { case (_, a, b, _) => (a, b) }
    // head_tokens is rendered as a scalar (space-joined) so rows-only
    // canonicalization can sort the frame; the array form stays available
    // via Bpe.tokenize's bpe_tokens column in the Scala API.
    Bpe.tokenize(docs(s, dir), merges)
      .select(col("doc_id"), col("n_bpe_tokens"),
        concat_ws(" ", slice(col("bpe_tokens"), 1, 8)).as("head_tokens"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------------------
  // q109 — media container-header sniffing: planted payloads cycle
  // through real PNG/GIF/JPEG/WAV header byte layouts; the engine PARSES
  // them (graft_media_header) while the oracle states the hand-derived
  // truth per format — an independent cross-check of the byte parsing.
  def q109_media_sniff(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.Multimodal
    val m = pmod(col("doc_id"), lit(4L))
    val planted = docs(s, dir).select(col("doc_id").as("media_id"),
      when(m === 0, lit(Multimodal.SampleHeaders.png))
        .when(m === 1, lit(Multimodal.SampleHeaders.gif))
        .when(m === 2, lit(Multimodal.SampleHeaders.jpeg))
        .otherwise(lit(Multimodal.SampleHeaders.wav)).as("payload"))
    Multimodal.sniff(planted).orderBy(col("media_id"))
  }

  private val q109_sql =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |                  WHEN 2 THEN 'jpeg' ELSE 'wav' END AS format,
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 320 WHEN 2 THEN 640 END AS INT) AS width,
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 48 WHEN 1 THEN 200 WHEN 2 THEN 480 END AS INT) AS height,
      |  CAST(CASE doc_id % 4 WHEN 3 THEN 8000 END AS INT) AS sample_rate,
      |  CAST(CASE doc_id % 4 WHEN 3 THEN 1 END AS INT) AS channels,
      |  CAST(CASE doc_id % 4 WHEN 3 THEN 1500 END AS BIGINT) AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin

  // --------------------------------------------------------------------------
  // q110 — rolling-window anomaly flags: per customer, each order's price
  // (exact cents) against its previous ≤6 orders; the flag is decided in
  // pure integer arithmetic ((v·n−Σ)² > k²(nΣv²−Σ²)), so both engines
  // agree bit-for-bit even at the boundary.
  def q110_rolling_anomaly(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(col("o_custkey"),
      col("o_orderkey"), col("o_orderdate"),
      floor(col("o_totalprice") * lit(100.0)).cast(LongType).as("cents"))
    Stats.rollingAnomaly(o, "o_custkey", Seq("o_orderdate", "o_orderkey"),
        "cents", lookback = 6, k = 2)
      .select(col("o_custkey"), col("o_orderkey"), col("cents"),
        col("win_n"), col("win_sum"), col("is_anomaly"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q110_sql =
    """WITH v AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
      |  FROM orders),
      |w AS (
      |  SELECT o_custkey, o_orderkey, cents,
      |    CAST(count(cents) OVER win AS BIGINT) AS win_n,
      |    CAST(sum(cents) OVER win AS BIGINT) AS win_sum,
      |    CAST(sum(cents * cents) OVER win AS BIGINT) AS win_sum2
      |  FROM v
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                 ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
      |SELECT o_custkey, o_orderkey, cents, win_n, win_sum,
      |  CAST(CASE WHEN win_n >= 3
      |              AND (cents * win_n - win_sum) * (cents * win_n - win_sum)
      |                  > 4 * (win_n * win_sum2 - win_sum * win_sum)
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM w ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q111 — key-skew report for lineitem.l_suppkey (the canonical join-key
  // diagnosis before a salting decision): one row of distinct-key count,
  // row count, min/max/median/p99 per-key counts, hottest key.
  def q111_key_skew(s: SparkSession, dir: String): DataFrame =
    Stats.keySkew(Tables.load(s, dir, "lineitem"), "l_suppkey")

  private val q111_sql =
    """WITH c AS (SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS cnt
      |           FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
      |b AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |        CAST(sum(cnt) AS BIGINT) AS n_rows,
      |        CAST(min(cnt) AS BIGINT) AS min_cnt,
      |        CAST(max(cnt) AS BIGINT) AS max_cnt FROM c),
      |h AS (SELECT cnt AS v, CAST(count(*) AS BIGINT) AS hc FROM c GROUP BY 1),
      |cm AS (SELECT v, hc,
      |         CAST(sum(hc) OVER (ORDER BY v) AS BIGINT) AS cum,
      |         CAST(sum(hc) OVER () AS BIGINT) AS n
      |       FROM h),
      |p AS (SELECT
      |  CAST(max(CASE WHEN cum - hc < (n + 1) // 2 AND (n + 1) // 2 <= cum THEN v END) +
      |       max(CASE WHEN cum - hc < (n + 2) // 2 AND (n + 2) // 2 <= cum THEN v END)
      |    AS DOUBLE) / 2.0 AS median_cnt,
      |  CAST(max(CASE WHEN cum - hc < CAST(ceil(0.99 * n) AS BIGINT)
      |                 AND CAST(ceil(0.99 * n) AS BIGINT) <= cum THEN v END)
      |    AS BIGINT) AS p99_cnt
      |  FROM cm),
      |t AS (SELECT CAST(k AS VARCHAR) AS top_key, cnt AS top_cnt FROM c
      |      ORDER BY cnt DESC, k LIMIT 1)
      |SELECT b.n_keys, b.n_rows, b.min_cnt, b.max_cnt,
      |  p.median_cnt, p.p99_cnt, t.top_key, t.top_cnt
      |FROM b, p, t""".stripMargin

  // --------------------------------------------------------------------------
  // q112 — Unicode NFC normalization: planted decomposed sequences
  // (e+COMBINING ACUTE, A+COMBINING RING) compose to their precomposed
  // forms; the engine runs the JDK normalizer, the oracle DuckDB's
  // utf8proc nfc_normalize — two independent Unicode implementations
  // agreeing byte-for-byte.
  def q112_nfc_normalize(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), concat(lit("caf"), lit("e\u0301"), lit(" "),
        lit("A\u030Angstro\u0308m "), col("text")).as("text"))
    planted.select(col("doc_id"),
        graft.functions.TextMetrics.nfcNormalize(col("text")).as("nfc_text"))
      .withColumn("n_chars_nfc", length(col("nfc_text")).cast(LongType))
      .orderBy(col("doc_id"))
  }

  private val q112_sql =
    """SELECT doc_id,
      |  nfc_normalize('caf' || chr(101) || chr(769) || ' ' ||
      |    chr(65) || chr(778) || 'ngstro' || chr(776) || 'm ' || text) AS nfc_text,
      |  CAST(length(nfc_normalize('caf' || chr(101) || chr(769) || ' ' ||
      |    chr(65) || chr(778) || 'ngstro' || chr(776) || 'm ' || text)) AS BIGINT) AS n_chars_nfc
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q113 — column drift between snapshots: l_quantity's distribution vs a
  // planted "today" where a third of orders shifted +5 — exact integer
  // TVD numerator over the two histograms (the snapshot dual of q97's
  // source divergence).
  def q113_column_drift(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val oldV = li.select(col("l_quantity").cast(LongType).as("v"))
    val newV = li.select((col("l_quantity").cast(LongType) +
      when(pmod(col("l_orderkey"), lit(3L)) === 0, lit(5L)).otherwise(lit(0L))).as("v"))
    Diff.columnDrift(oldV, newV, "v")
  }

  private val q113_sql =
    """WITH o AS (SELECT CAST(l_quantity AS BIGINT) AS v FROM lineitem
      |           WHERE l_quantity IS NOT NULL),
      |n AS (SELECT CAST(l_quantity AS BIGINT) +
      |        (CASE WHEN l_orderkey % 3 = 0 THEN 5 ELSE 0 END) AS v
      |      FROM lineitem WHERE l_quantity IS NOT NULL),
      |ho AS (SELECT v, CAST(count(*) AS BIGINT) AS c_old FROM o GROUP BY 1),
      |hn AS (SELECT v, CAST(count(*) AS BIGINT) AS c_new FROM n GROUP BY 1),
      |j AS (SELECT coalesce(ho.v, hn.v) AS v, coalesce(c_old, 0) AS c_old,
      |        coalesce(c_new, 0) AS c_new
      |      FROM ho FULL JOIN hn ON ho.v = hn.v),
      |t AS (SELECT CAST(sum(c_old) AS BIGINT) AS n_old,
      |        CAST(sum(c_new) AS BIGINT) AS n_new,
      |        CAST(count(*) AS BIGINT) AS n_values FROM j),
      |m AS (SELECT t.n_old, t.n_new, t.n_values,
      |        sum(abs(CAST(c_old AS HUGEINT) * t.n_new
      |                - CAST(c_new AS HUGEINT) * t.n_old)) AS tvd_num
      |      FROM j, t GROUP BY 1, 2, 3)
      |SELECT n_old, n_new, n_values, CAST(tvd_num AS BIGINT) AS tvd_num,
      |  CAST(floor(CAST(tvd_num AS DOUBLE) * 1000000.0 /
      |    (2.0 * CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE))) AS BIGINT) AS tvd_fp
      |FROM m""".stripMargin

  // --------------------------------------------------------------------------
  // q114 — event-transition matrix: P(next event type | current) per the
  // per-user event order ((millis, event_id) — the Events pack's nano-safe
  // convention), probabilities as exact integer-division fixed point.
  def q114_transition_matrix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_millis(col("ts")), col("event_id"))
    // persist the transition-count fan-out (|event types|² rows — tiny):
    // `pairs` feeds the join AND `totals`, and unpersisted each consumer
    // re-ran the per-user window + lead over the full event table
    // (profiled: 2 × ~2.7 s executor time per warm run at sf0.1)
    val pairs = graft.core.Caches.persist(Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt")))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("cnt")).as("row_total"))
    pairs.join(totals, Seq("from_type"))
      .withColumn("p_fp",
        call_function("div", col("cnt") * lit(1000000L), col("row_total"))
          .cast(LongType))
      .select(col("from_type"), col("to_type"), col("cnt"), col("row_total"), col("p_fp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val q114_sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS to_type
      |  FROM events),
      |p AS (SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
      |      FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total FROM p GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.cnt, t.row_total,
      |  CAST((p.cnt * 1000000) // t.row_total AS BIGINT) AS p_fp
      |FROM p JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // --------------------------------------------------------------------------
  // q115 — mergeable sketch rollup (the incremental-cube pattern): daily
  // HLL sketches of distinct users are built ONCE (the stored partial —
  // at production scale a materialized daily table), then weekly distinct
  // estimates come from UNIONING the stored sketches, never rescanning
  // events. The estimate itself can't be hash-compared (DuckDB can't
  // reproduce Spark's HLL), so the DRIVER-VISIBLE surface emits the exact
  // weekly distincts plus `est_ok` = |approx − exact| ≤ 5%·exact, and the
  // oracle asserts est_ok = 1 over the same exact counts — a sketch
  // regression flips the flag and fails the hash. The exact-distinct join
  // exists only for this gate; production consumers read the sketch
  // subtree (the ≤5% ScalaTest accuracy gate also remains).
  def q115_sketch_rollup(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n_events"))
    val weekly = daily
      .groupBy(date_trunc("week", col("day")).as("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_week_users"))
    val exact = Tables.load(s, dir, "events")
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(count_distinct(col("user_id")).as("exact_week_users"))
    weekly.join(exact, Seq("week"))
      .select(unix_millis(col("week")).as("week_ms"), col("n_days"),
        col("n_events"), col("exact_week_users"),
        (abs(col("approx_week_users") - col("exact_week_users")) <=
          col("exact_week_users") * lit(0.05)).cast("int").as("est_ok"))
      .orderBy(col("week_ms"))
  }

  private val q115_sql =
    """WITH weekly AS (
      |  SELECT date_trunc('week', ts) AS week,
      |    count(DISTINCT date_trunc('day', ts)) AS n_days,
      |    count(*) AS n_events,
      |    count(DISTINCT user_id) AS exact_week_users
      |  FROM events GROUP BY 1)
      |SELECT epoch_ms(week) AS week_ms, n_days, n_events, exact_week_users,
      |  1 AS est_ok
      |FROM weekly ORDER BY week_ms""".stripMargin

  // --------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_tfidf_cosine_pairs" -> (q96_tfidf_cosine_pairs _),
    "q97_source_divergence" -> (q97_source_divergence _),
    "q98_zorder_key" -> (q98_zorder_key _),
    "q99_profile" -> (q99_profile _),
    "q100_keyword_score" -> (q100_keyword_score _),
    "q101_order_gaps" -> (q101_order_gaps _),
    "q102_sentences" -> (q102_sentences _),
    "q103_extract_links" -> (q103_extract_links _),
    "q104_source_scorecard" -> (q104_source_scorecard _),
    "q105_snapshot_diff" -> (q105_snapshot_diff _),
    "q106_fk_audit" -> (q106_fk_audit _),
    "q107_bpe_merges" -> (q107_bpe_merges _),
    "q108_bpe_tokenize" -> (q108_bpe_tokenize _),
    "q109_media_sniff" -> (q109_media_sniff _),
    "q110_rolling_anomaly" -> (q110_rolling_anomaly _),
    "q111_key_skew" -> (q111_key_skew _),
    "q112_nfc_normalize" -> (q112_nfc_normalize _),
    "q113_column_drift" -> (q113_column_drift _),
    "q114_transition_matrix" -> (q114_transition_matrix _),
    "q115_sketch_rollup" -> (q115_sketch_rollup _))

  def oracle: Map[String, String] = Map(
    "q96_tfidf_cosine_pairs" -> q96_sql,
    "q97_source_divergence" -> q97_sql,
    "q98_zorder_key" -> q98_sql,
    "q99_profile" -> q99_sql,
    "q100_keyword_score" -> q100_sql,
    "q101_order_gaps" -> q101_sql,
    "q102_sentences" -> q102_sql,
    "q103_extract_links" -> q103_sql,
    "q104_source_scorecard" -> q104_sql,
    "q105_snapshot_diff" -> q105_sql,
    "q106_fk_audit" -> q106_sql,
    "q109_media_sniff" -> q109_sql,
    "q110_rolling_anomaly" -> q110_sql,
    "q111_key_skew" -> q111_sql,
    "q112_nfc_normalize" -> q112_sql,
    "q113_column_drift" -> q113_sql,
    "q114_transition_matrix" -> q114_sql,
    "q115_sketch_rollup" -> q115_sql)
}
