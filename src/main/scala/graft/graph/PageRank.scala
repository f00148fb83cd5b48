package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph rank over a weighted directed edge list — the
  * link-analysis primitive a crawl-curation pipeline runs to weight
  * domains/hosts by citation mass before sampling (the PageRank-style
  * prior in CommonCrawl-derived corpus pipelines).
  *
  * Deterministic FIXED-POINT arithmetic: ranks are `long` micro-units
  * (`scale` = 1.0) and every per-iteration step is integer multiply /
  * integer `div` / integer sum. Integer addition is associative and
  * commutative, so the result is bit-identical regardless of partition
  * count, shuffle order, or engine — which is what makes an iterative
  * float algorithm ORACLE-CHECKABLE (an IEEE-double PageRank would
  * drift across engines with accumulation order). Update rule per
  * iteration, all in longs:
  *
  *   contrib(e: src→dst, w) = (pr(src) * w) div outW(src)
  *   pr'(node) = base + (dampNum * Σ contrib(in-edges)) div dampDen
  *   base      = scale * (dampDen - dampNum) div dampDen
  *
  * Overflow bound: `pr * w` ≤ totalMass × maxW ≈ (nNodes × scale) ×
  * maxW — with scale 1e6 that holds nNodes × maxW < 9e12, far past any
  * harness or cluster graph this engine targets (callers with hotter
  * weights pick a smaller scale).
  *
  * Scale design (100 TB): the loop is UNROLLED into one declarative
  * plan — no per-iteration action, no driver-side state. Each
  * iteration costs two shuffles of the RANK table (join ranks⋈edges on
  * src, re-aggregate contributions on dst); the edge list itself is
  * scanned from the same source each iteration, which AQE serves with
  * exchange reuse single-job. Ranks are one row per node — orders of
  * magnitude smaller than the edge list — so the per-iteration shuffle
  * is the small side. For deep iteration counts (>10) callers should
  * persist the grouped edge list and checkpoint ranks every few rounds
  * (same lineage rationale as [[graft.dedup.Dedup.connectedComponents]]).
  */
object PageRank {

  /** Fixed-point PageRank over `(srcCol, dstCol, wCol)` edges. Returns
    * `(node: long, pr: long)` after `iterations` rounds, every node in
    * src∪dst present. Nodes with no out-edges simply contribute
    * nothing (their mass drains — the standard simplification; the
    * harness graph below has no dangling nodes by construction).
    */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, iterations: Int = 5,
                    scale: Long = 1000000L, dampNum: Long = 85L,
                    dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && dampNum > 0 && dampNum < dampDen)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
    val outw = e.groupBy("src").agg(sum(col("w")).as("ow"))
    val ew = e.join(outw, "src")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iterations) {
      val contribs = ew.join(ranks, ew("src") === ranks("node"))
        .select(ew("dst"), expr("pr * w div ow").as("c"))
      ranks = nodes.join(
          contribs.groupBy("dst").agg(sum(col("c")).as("cin")),
          nodes("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$dampNum * coalesce(cin, 0L) div $dampDen"))
            .cast("long").as("pr"))
    }
    ranks
  }

  /** The harness graph: supplier↔customer purchase edges from
    * lineitem⋈orders, weight = lineitem count, BOTH directions (so the
    * graph is cycle-rich and rank genuinely iterates — a one-direction
    * bipartite graph reaches its fixed point in two rounds). Customer
    * node ids are offset into a disjoint namespace.
    */
  def purchaseGraph(lineitem: DataFrame, orders: DataFrame,
                    custOffset: Long = 10000000L): DataFrame = {
    val pairs = lineitem.select("l_orderkey", "l_suppkey")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey").as("s"),
        (col("o_custkey") + custOffset).as("c"))
      .agg(count(lit(1)).as("w"))
    pairs.select(col("s").as("src"), col("c").as("dst"), col("w"))
      .unionAll(pairs.select(col("c").as("src"), col("s").as("dst"),
        col("w")))
  }
}
