package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side reference: the same fixed-point update
    * rule coded over plain Scala Maps (longs all the way), so a plan
    * bug can't hide in a shared formula.
    */
  private def referencePr(edges: Seq[(Long, Long, Long)],
                          iterations: Int): Map[Long, Long] = {
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => pr(s) * w / outW(s) }.sum
      }
      pr = nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    pr
  }

  test("pageRankFixed matches the driver-side integer reference") {
    // cycle-rich asymmetric weighted graph incl. a pure sink (node 5)
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L),
      (2L, 1L, 5L), (4L, 1L, 1L), (1L, 4L, 1L), (1L, 5L, 2L))
    val got = PageRank.pageRankFixed(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referencePr(edges, 5))
  }

  test("mass conservation holds on a graph with no dangling nodes") {
    // purchaseGraph is symmetric (both directions), so no node dangles:
    // total rank mass stays within the damping identity each round
    val g = PageRank.purchaseGraph(
      graft.model.Tables.lineitem(spark, sf()),
      graft.model.Tables.orders(spark, sf()))
    // symmetric construction → every node has out-edges (no dangling)
    assert(g.select("src").except(g.select("dst")).count() == 0)
    val pr = PageRank.pageRankFixed(g, "src", "dst", "w", iterations = 3)
    val total = pr.agg(org.apache.spark.sql.functions.sum("pr"))
      .head().getLong(0)
    val nodes = pr.count()
    // base mass exactly 0.15 per node; damped mass ≤ 0.85 of previous
    // total (integer div only rounds down) → bounds on the total
    assert(total >= 150000L * nodes && total <= 1000000L * nodes)
  }
}
