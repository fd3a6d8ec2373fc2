package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Lexical retrieval over a document corpus — the keyword-search
  * complement to the embedding family in [[Similarity]]. The reference
  * (`/root/reference/`, a byte-stream processor) has no search surface at
  * all; this is part of the SURVEY §2.4 extension set a training-data
  * pipeline needs (find all documents matching an audit/eval query at
  * corpus scale).
  *
  * Scoring is BM25 with two deliberate deviations, both in service of
  * exact reproducibility (an audit that returns different documents on
  * re-run is useless):
  *
  *   - '''rational idf''' `(N - df + 0.5) / (df + 0.5)` — the argument of
  *     the standard `ln(...)` idf, un-logged. Per term it is a monotone
  *     transform (same per-term document ordering); across summed terms it
  *     weighs rare terms more sharply than the log form. Chosen because
  *     `ln` is not correctly-rounded in IEEE 754 (JVM `Math.log` vs
  *     another engine's libm may differ in the last ulp), which would make
  *     results engine-dependent; every operation used here (+, −, ×, ÷)
  *     IS correctly rounded, so scores are bit-identical on any platform.
  *   - '''fixed-point scores''': each per-(doc, term) partial is
  *     `floor(score · 10⁶)` as BIGINT and the per-doc total is an integer
  *     sum — associative, so the result is independent of partition count
  *     and merge order. A float sum would differ run-to-run under Spark's
  *     nondeterministic partial-aggregation order.
  *
  * Plan shape at scale (the inverted-index probe, without building one):
  *   1. the corpus tokenizes once into a persisted hub (two consumers:
  *      stats + postings); the posting probe keeps ONLY query-term
  *      occurrences —
  *      the explode is filtered before any shuffle, so the single
  *      `groupBy(doc, term)` exchange carries just the searched terms'
  *      posting lists (∝ df of the query terms, not corpus size);
  *   2. corpus stats (N, Σdl) are one tiny aggregate broadcast back as a
  *      1-row cross join; per-term df (≤ |terms| rows) broadcasts onto
  *      the postings;
  *   3. top-k is `orderBy.limit` → TakeOrderedAndProject (per-partition
  *      heaps, no global sort).
  */
object Search {

  /** Top-k documents by fixed-point rational-idf BM25 over
    * whitespace-tokenized `textCol`. Returns (doc_id, n_terms, score_fp)
    * where score_fp = Σ_term floor(idf·sat·10⁶) and n_terms counts the
    * distinct query terms present. Ties break on ascending id.
    *
    * `k1` saturates term frequency (higher ⇒ slower saturation), `b`
    * scales length normalization (0 = none, 1 = full).
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    // persisted hub: the corpus is tokenized ONCE for its two consumers
    // (the 1-row stats aggregate and the posting probe) — the file-local
    // convention for two-consumer tokenizations
    val base = graft.core.Caches.persist(docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ", -1).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast(LongType).as("dl")))
    // 1-row corpus stats, memoized to driver literals (the same two longs
    // every probe over this corpus needs — warm re-runs and sibling
    // queries pay zero jobs; same values ⇒ same IEEE tree ⇒ same bits)
    val (nDocs, sumDl) = graft.core.Caches.memo(base, "bm25Stats") {
      val r = base.agg(count(lit(1)), sum(col("dl"))).head
      (java.lang.Long.valueOf(r.getLong(0)),
        java.lang.Long.valueOf(if (r.isNullAt(1)) 0L else r.getLong(1)))
    }
    // Posting lists for the query terms only: the isin filter runs inside
    // the same stage as the explode, so the groupBy shuffle sees only
    // matching (doc, term) occurrences. Per-term df rides a count window
    // over the term partition — the postings are already ∝ query-term df,
    // so the extra exchange is tiny and the separate vocab aggregate +
    // broadcast-build job disappears.
    val scored = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("n_docs", lit(nDocs.longValue))
      .withColumn("sum_dl", lit(sumDl.longValue))
      .select(col("doc_id"), termScoreFp(k1, b).as("fp"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("fp")).as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(topK)
  }

  /** floor(idf·sat·10⁶) for one (doc, term) posting row. The expression
    * tree (parenthesization and literal values) is mirrored verbatim by
    * [[bm25OracleSql]]: every op is correctly-rounded IEEE, so identical
    * trees ⇒ identical bits in any engine. */
  private def termScoreFp(k1: Double, b: Double): Column = {
    val idf = ((col("n_docs") - col("df")).cast(DoubleType) + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs").cast(DoubleType)
    val sat = (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
      (col("tf").cast(DoubleType) +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast(DoubleType) / avgdl)))
    floor(idf * sat * lit(1000000.0)).cast(LongType)
  }

  /** Persisted per-document TERM-FREQUENCY hub `(doc_id, term, tf)` —
    * the one token-scale aggregate the whole tf·idf family is built on.
    * [[tfidfKeywords]] consumes it directly (tf and vocabulary df both
    * derive from it); [[tfidfCosinePairs]] re-keys it to [[TextAnalysis
    * .hash60]] gram keys with a vocab-scale map-side projection (never a
    * second corpus pass). Persisting the POST-aggregate table (not the
    * raw exploded occurrences) keeps the cache at vocab×doc scale while
    * still amortizing the tokenize+count shuffle across every family
    * consumer in the session. Spark's CacheManager dedupes re-persists of
    * the same canonical plan, so calling two family operators over one
    * corpus caches the hub once; released via
    * [[graft.core.Caches.unpersistAll]] at corpus boundaries. */
  private def tfHub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Caches.persist(docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ", -1)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))

  /** The df-ANNOTATED face of [[tfHub]], laid out for per-document
    * consumers: each (doc_id, term, tf) row carries its term's document
    * frequency (a count window over the term partition — the same integer
    * a vocab aggregate + join would produce, without the broadcast build),
    * and the result is hash-REPARTITIONED BY doc_id before persisting, so
    * a warm `groupBy(doc_id)` over the cache is exchange-FREE
    * (InMemoryTableScan preserves the cached plan's hash partitioning).
    * Both window and repartition are paid once at hub build; the window's
    * term partitions are vocab-keyed (zipf-head safe: one partition holds
    * one term's posting rows at worst, bounded by corpus doc count — the
    * same bound the df join shape had). */
  private def dfHub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Caches.persist(
      tfHub(docs, idCol, textCol)
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .repartition(col("doc_id")))

  /** Top-k keywords PER DOCUMENT by tf·idf — the corpus-wide tagging
    * projection ([[bm25TopK]] is the query-time probe; this scores every
    * (doc, term) pair). Same reproducibility discipline: rational idf
    * `(N − df + 0.5)/(df + 0.5)`, fixed-point `floor(tf · idf · 10⁶)`.
    *
    * Plan shape at scale: tokenize once into the family's persisted tf
    * hub ([[tfHub]] — shared with [[tfidfCosinePairs]]), annotate df and
    * lay it out by doc_id once into [[dfHub]] (never a second corpus
    * pass); N is a memoized driver literal. The warm query is then
    * cache-scan → exchange-free per-doc aggregation: top-k happens INSIDE
    * that aggregation (sorted-slice of a list bounded by the document's
    * own distinct-term count), not a rank window. Returns
    * (doc_id, term, tf, df, score_fp, rk), ties broken by term
    * ascending. */
  def tfidfKeywords(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, "k must be positive")
    // N from the pre-explode projection (docs are unique by id — the table
    // contract), memoized to a driver literal: the same scalar every
    // family query over this corpus needs, so warm re-runs and sibling
    // queries pay zero jobs for it (same value ⇒ same IEEE tree ⇒ same
    // bits as the old broadcast form)
    val docsF = docs.filter(col(textCol).isNotNull)
    val nDocs = graft.core.Caches.memo(docsF, "nDocsNotNull") {
      java.lang.Long.valueOf(docsF.count())
    }
    // the df-annotated family hub, already partitioned by doc_id: the
    // warm path below is cache-scan → exchange-free per-doc aggregation
    val withDf = dfHub(docs, idCol, textCol)
    val idf = ((lit(nDocs.longValue) - col("df")).cast(DoubleType) + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    // top-k inside the per-doc aggregation, not a rank window: the sorted
    // struct list is bounded by the DOCUMENT's distinct-term count (row
    // width ∝ doc length, never corpus size), and slicing it to k replaces
    // the window's exchange+sort+filter with the grouping the hub's
    // layout already satisfies. Sort key (−score_fp, term) = the rank
    // order (score desc, term asc); rk = slice position.
    withDf
      .withColumn("score_fp",
        floor(col("tf").cast(DoubleType) * idf * lit(1000000.0)).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("score_fp")).as("neg"), col("term"), col("tf"), col("df")))),
        1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("doc_id"), col("t.term"), col("t.tf"), col("t.df"),
        (-col("t.neg")).as("score_fp"), (col("pos") + 1).cast(IntegerType).as("rk"))
  }

  /** The DuckDB dual of [[tfidfKeywords]] — same tokenization, tree, and
    * floor. */
  def tfidfOracleSql(table: String, k: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM $table WHERE text IS NOT NULL),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
       |      FROM $table WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dfp AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfp.df,
       |  CAST(floor(CAST(tf.tf AS DOUBLE) *
       |    ((CAST(n.n_docs - dfp.df AS DOUBLE) + 0.5) / (CAST(dfp.df AS DOUBLE) + 0.5))
       |    * 1000000.0) AS BIGINT) AS score_fp
       |  FROM tf JOIN dfp USING (term), n),
       |rk AS (SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score_fp DESC, term) AS rk FROM sc)
       |SELECT doc_id, term, tf, df, score_fp, rk FROM rk WHERE rk <= $k
       |ORDER BY doc_id, rk""".stripMargin

  /** Thresholded near-dup pairs under WEIGHTED (tf·idf) cosine over the
    * sparse term vectors — the lexical complement of the dense-embedding
    * pair family ([[graft.ext.Similarity.annLshPairs]]): Jaccard treats
    * every shingle equally, embeddings need a model; tf·idf cosine catches
    * documents that share *distinctive* vocabulary.
    *
    * Exactness contract: term weights are integer
    * `w = tf · floor(idf · 100)` with the rational idf
    * `(N − df + 0.5)/(df + 0.5)` (see [[bm25TopK]] for why no `ln`), so
    * dots and norms are exact BIGINT sums, and the threshold
    * `cos ≥ num/den` is decided in exact integer arithmetic:
    * `den²·dot² ≥ num²·‖a‖²·‖b‖²` evaluated in 38-digit decimals
    * (HUGEINT in the oracle) — no float ever decides membership. The
    * reported `cos_fp` uses IEEE sqrt/divide (correctly rounded, mirrored
    * expression tree → bit-identical cross-engine).
    *
    * Plan shape at scale: one tokenization pass → (doc, gram-key) tf
    * aggregate; vocabulary df off the tf table; terms with `df > maxDf`
    * are dropped from the VOCABULARY (ubiquitous terms carry no cosine
    * signal — and they are exactly the terms whose posting lists explode
    * the self-join), so candidate pairs come only from discriminative
    * posting lists (≤ maxDf² pairs per term). Norms are computed over the
    * same capped vocabulary, keeping cos ≤ 1 consistent. Terms join on
    * [[TextAnalysis.hash60]] keys — constant-width longs, never strings,
    * through every shuffle. Compose after [[graft.ext.Dedup.exactDedup]]
    * at corpus scale so exact-copy groups don't quadratically re-pair.
    *
    * Integer envelope (the BINDING constraint is the threshold decision,
    * not the norms): `num² · na2 · nb2 < 10³⁸` — i.e. per-doc norms
    * below ~10¹⁸/num, true to ~10⁶-doc corpora with ~10³-term documents
    * at the ×100 idf scale. Past that, lower the idf scale (the cosine
    * threshold is scale-invariant, so results only change by the coarser
    * weight rounding) or move the sums to DECIMAL(38,0) as
    * [[TextAnalysis.sourceDivergence]] does. */
  def tfidfCosinePairs(docs: DataFrame, minCosNum: Int, minCosDen: Int,
      maxDf: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minCosNum > 0 && minCosDen >= minCosNum, "need 0 < num/den <= 1")
    require(maxDf > 1, "maxDf must admit at least one pair")
    val nDocs = docs.filter(col(textCol).isNotNull).agg(count(lit(1)).as("n_docs"))
    // the family tf hub re-keyed to hash60 gram keys: a vocab×doc-scale
    // projection + re-aggregate (merging any colliding terms — the gk
    // grouping contract below), never a second token-scale corpus pass.
    val tf = graft.core.Caches.persist(
      tfHub(docs, idCol, textCol)
        .select(col("doc_id"), TextAnalysis.hash60(col("term")).as("gk"), col("tf"))
        .groupBy(col("doc_id"), col("gk")).agg(sum(col("tf")).as("tf")))
    val vocab = tf.groupBy(col("gk")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    // integer weight w = tf · floor(idf·100); idf expression tree mirrored
    // by the oracle SQL verbatim
    val idfInt = floor(((col("n_docs") - col("df")).cast(DoubleType) + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5)) * lit(100.0)).cast(LongType)
    val w = graft.core.Caches.persist(
      tf.join(vocab, Seq("gk")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("gk"), (col("tf") * idfInt).as("w")))
    val norms = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("na2"))
    // pair generation by posting-list expansion, never a self-join: one
    // grouping on the gram key collects each discriminative term's
    // posting list — ≤ maxDf structs wide BY CONSTRUCTION (the vocab cap
    // above), so row width is bounded at any corpus size — and the a<b
    // pairs expand map-side (sort_array orders by doc_id, the join's
    // old `a.doc_id < b.doc_id`). Same sums, one exchange fewer.
    val pairs = w
      .groupBy(col("gk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("w")))).as("xs"))
      .select(explode(flatten(transform(col("xs"), (x, ix) =>
        transform(slice(col("xs"), ix + lit(2), size(col("xs"))), y =>
          struct(x("doc_id").as("da"), y("doc_id").as("db"),
            (x("w") * y("w")).as("ww")))))).as("p"))
      .groupBy(col("p.da").as("doc_a"), col("p.db").as("doc_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("p.ww")).as("dot"))
    val dec = DecimalType(20, 0)
    val lhs = col("dot").cast(dec) * col("dot").cast(dec) *
      lit(minCosDen.toLong * minCosDen)
    val rhs = lit(minCosNum.toLong * minCosNum) *
      col("na2").cast(dec) * col("nb2").cast(dec)
    val nA = norms.select(col("doc_id").as("__na_id"), col("na2"))
    val nB = norms.select(col("doc_id").as("__nb_id"), col("na2").as("nb2"))
    pairs
      .join(nA, col("doc_a") === col("__na_id"))
      .join(nB, col("doc_b") === col("__nb_id"))
      .filter(col("dot") > 0 && lhs >= rhs)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("dot"),
        col("na2"), col("nb2"),
        floor(col("dot").cast(DoubleType) * lit(1000000.0) /
          (sqrt(col("na2").cast(DoubleType)) * sqrt(col("nb2").cast(DoubleType))))
          .cast(LongType).as("cos_fp"))
  }

  /** The DuckDB dual of [[tfidfCosinePairs]] — same hash60 keys, idf
    * tree, integer threshold (HUGEINT), and cos_fp float tree. */
  def tfidfCosinePairsOracleSql(table: String, minCosNum: Int, minCosDen: Int,
      maxDf: Int): String = {
    val num2 = minCosNum.toLong * minCosNum
    val den2 = minCosDen.toLong * minCosDen
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15)) AS BIGINT) AS gk
       |  FROM $table WHERE text IS NOT NULL),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
       |      FROM $table WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, gk, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
       |v AS (SELECT gk, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |      HAVING count(*) <= $maxDf),
       |w AS (SELECT tf.doc_id, tf.gk,
       |        tf.tf * CAST(floor((CAST(n.n_docs - v.df AS DOUBLE) + 0.5) /
       |          (CAST(v.df AS DOUBLE) + 0.5) * 100.0) AS BIGINT) AS w
       |      FROM tf JOIN v USING (gk), n),
       |norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS na2 FROM w GROUP BY 1),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        CAST(count(*) AS BIGINT) AS n_common,
       |        CAST(sum(a.w * b.w) AS BIGINT) AS dot
       |      FROM w a JOIN w b ON a.gk = b.gk AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT p.doc_a, p.doc_b, p.n_common, p.dot, x.na2, y.na2 AS nb2,
       |  CAST(floor(CAST(p.dot AS DOUBLE) * 1000000.0 /
       |    (sqrt(CAST(x.na2 AS DOUBLE)) * sqrt(CAST(y.na2 AS DOUBLE)))) AS BIGINT) AS cos_fp
       |FROM p JOIN norms x ON p.doc_a = x.doc_id
       |       JOIN norms y ON p.doc_b = y.doc_id
       |WHERE p.dot > 0
       |  AND CAST(p.dot AS HUGEINT) * p.dot * $den2 >= CAST($num2 AS HUGEINT) * x.na2 * y.na2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** The DuckDB dual of [[bm25TopK]] — same tokenization (literal-space
    * split), same expression tree, same fixed-point floor. Literals are
    * interpolated from the SAME Scala doubles (`toString` round-trips
    * exactly), so both engines parse identical values. */
  def bm25OracleSql(table: String, terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val inList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM $table WHERE text IS NOT NULL),
       |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM base),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf
       |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
       |       WHERE term IN ($inList) GROUP BY 1, 2, 3),
       |dfp AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |  CAST(floor(
       |    ((CAST(stats.n_docs - dfp.df AS DOUBLE) + 0.5) / (CAST(dfp.df AS DOUBLE) + 0.5))
       |    * ((CAST(tf.tf AS DOUBLE) * ${k1 + 1.0}) /
       |       (CAST(tf.tf AS DOUBLE) +
       |        $k1 * (1.0 - $b + $b * (CAST(tf.dl AS DOUBLE) /
       |          (CAST(stats.sum_dl AS DOUBLE) / CAST(stats.n_docs AS DOUBLE))))))
       |    * 1000000.0) AS BIGINT) AS fp
       |  FROM tf JOIN dfp USING (term), stats)
       |SELECT doc_id, count(*) AS n_terms, CAST(sum(fp) AS BIGINT) AS score_fp
       |FROM sc GROUP BY 1 ORDER BY score_fp DESC, doc_id LIMIT $topK""".stripMargin
  }
}
