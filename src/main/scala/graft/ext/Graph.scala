package graft.ext

import graft.core.Caches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Link-graph analytics over an edge table — the crawl-graph ranking pass
  * a web-scale corpus pipeline runs on the edges
  * [[TextAnalysis.extractLinks]] produces (domain authority feeds source
  * quality weighting, crawl prioritization, and spam-domain downweights).
  * The reference (`/root/reference/`, a record-at-a-time stream
  * processor) has no graph surface; this extends the corpus toolkit the
  * same way the dedup/similarity families do.
  */
object Graph {

  /** PageRank in exact FIXED-POINT arithmetic — deterministic across
    * engines and partitionings, unlike float power iteration (whose sums
    * are association-order-dependent):
    *
    *   rank₀(v)   = scale                          (i.e. 1.0)
    *   rankᵢ₊₁(v) = ((100−damp)·scale
    *                 + damp · Σ_{(u→v)} ⌊rankᵢ(u) / outdeg(u)⌋) div 100
    *
    * with `damp` a whole percentage (85 = the classic 0.85). Every step
    * is integer: the per-edge contribution is a truncating division, the
    * sum is exact, and the final blend is one integer division — so two
    * independent implementations agree bit-for-bit after any number of
    * iterations. Mass from DANGLING nodes (no outlinks) leaves the system
    * (the "drop" convention; ranks then sit below |V|·scale) — documented
    * rather than redistributed, which would need a per-iteration global
    * scalar. Integer envelope: ranks are bounded by |V|·scale·damp/(100−damp),
    * so BIGINT holds for any |V|·scale below ~10¹⁷.
    *
    * Scale shape: the edge table (joined once with out-degrees) is
    * persisted and hash-partitioned on `src` ONCE; each iteration
    * shuffles only the RANK vector (|V| rows — orders of magnitude below
    * |E|) to the edges' partitioning, aggregates contributions by `dst`,
    * and left-joins back onto the node vector so inbound-less nodes keep
    * the teleport term. No driver materialization at any size; iteration
    * count is a small constant so lineage stays shallow. */
  def pageRankFp(edges: DataFrame, iters: Int, dampPct: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be positive: $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct must be 0..100: $dampPct")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__pr_deg"))
    val eDeg = Caches.persist(
      e.join(outdeg, "src").repartition(col("src")))
    val nodesP = Caches.persist(nodes)
    val teleport = (100L - dampPct) * scale
    var ranks = nodesP.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          call_function("div", col("rank"), col("__pr_deg")).cast(LongType).as("__pr_c"))
        .groupBy(col("dst")).agg(sum(col("__pr_c")).as("__pr_in"))
      ranks = nodesP
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          call_function("div",
            lit(teleport) + lit(dampPct.toLong) * coalesce(col("__pr_in"), lit(0L)),
            lit(100L)).cast(LongType).as("rank"))
    }
    ranks
  }

  /** Exact triangle count via DEGREE-ORIENTED edge joining — the
    * clustering-coefficient / community-density signal over an undirected
    * graph. Edges are first undirected+deduplicated, then ORIENTED from
    * the lower-degree endpoint to the higher (ties by node id): every
    * triangle has exactly one orientation-respecting wedge, so one
    * self-join on the wedge apex + one closing-edge semi-join counts each
    * triangle ONCE — and, crucially, the join fan-out per node is bounded
    * by its ORIENTED out-degree, which is O(√|E|) for any graph
    * (a hub with a million followers contributes wedges only toward its
    * few higher-degree peers, not the million² a naive wedge join would
    * build). This is the standard scalable formulation; cost
    * O(|E|^{3/2}) worst-case instead of Σ deg².
    *
    * Returns one row: `n_nodes`, `n_edges` (undirected), `n_triangles`.
    * Exact integers throughout. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val raw = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst")) // self-loops close no triangles
    // canonical undirected edge (u < v), deduplicated — a hub read three
    // times (degrees, orientation join, edge count), so persist it; the
    // degree table (|V| rows) likewise feeds two join sides + the node count
    val und = graft.core.Caches.persist(raw.select(
      least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct())
    val deg = graft.core.Caches.persist(
      und.select(col("u").as("node")).union(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg")))
    // orient a→b iff (deg, id) of a < of b — a total order, so acyclic
    val withDeg = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    val oriented = graft.core.Caches.persist(withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("u")).otherwise(col("v")).as("a"),
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("v")).otherwise(col("u")).as("b")))
    // wedges a→b, a→c with b != c (each unordered {b,c} once)
    val e1 = oriented.select(col("a"), col("b").as("w1"))
    val e2 = oriented.select(col("a"), col("b").as("w2"))
    val wedges = e1.join(e2, Seq("a")).filter(col("w1") < col("w2"))
    // close the wedge: is (w1→w2) or (w2→w1) an oriented edge?
    val closing = oriented.select(
      least(col("a"), col("b")).as("w1"), greatest(col("a"), col("b")).as("w2"))
    val tri = wedges.join(closing, Seq("w1", "w2"), "left_semi")
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val nTri = tri.agg(count(lit(1)).as("n_triangles"))
    // the persisted oriented-edge hub stays live for the consumer's run;
    // Verify/Bench release it via Caches.unpersistAll() between queries
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  /** Per-node degree report: out-degree, in-degree, and distinct
    * neighbor counts — the cheap structural profile run before ranking
    * (hub/sink detection, dangling-mass estimate for [[pageRankFp]]).
    * Two aggregates over the edge list, one full-outer merge on the
    * node id. */
  def degreeStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val out = e.groupBy(col("src").as("node")).agg(
      count(lit(1)).as("out_edges"), countDistinct(col("dst")).as("out_distinct"))
    val in = e.groupBy(col("dst").as("node")).agg(
      count(lit(1)).as("in_edges"), countDistinct(col("src")).as("in_distinct"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_edges"), lit(0L)).as("out_edges"),
        coalesce(col("out_distinct"), lit(0L)).as("out_distinct"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        coalesce(col("in_distinct"), lit(0L)).as("in_distinct"))
  }
}
