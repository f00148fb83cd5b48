package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983; the
  * distributed formulation is Montresor et al. 2013): repeatedly drop
  * every node whose CURRENT degree is below k, until the k-core — the
  * maximal subgraph where every node keeps ≥ k neighbours — remains.
  * Curation use: the k-core of a domain/link graph is the "dense
  * establishment" a crawl prioritises, and peeling depth separates
  * organic periphery from spam cores.
  *
  * Like [[PageRank.pageRankFixed]] and
  * [[LabelPropagation.labelPropagationFixed]], the registered contract
  * is a FIXED number of peeling rounds, unrolled into one declarative
  * plan — that is what makes an iterative algorithm oracle-checkable
  * and partition-order-exact. Peeling converges when a round drops
  * nobody; chains peel one hop per round, so worst case is O(diameter)
  * rounds — callers pick `rounds` for their graph (the harness graph
  * converges at its registered k in 6), and a truncated run is still
  * well-defined: exactly `rounds` peels, reported as-is.
  *
  * Scale shape: each round is one degree aggregation (node-sized
  * output) + two hash semi-joins of the edge list against the kept
  * set — all key-partitioned shuffles, no cartesian. The edge list
  * only ever shrinks. For deep peels, checkpoint every few rounds
  * (lineage rationale as [[graft.dedup.Dedup.connectedComponents]]).
  */
object KCore {

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Lineage truncation between rounds — same policy as
    * [[graft.dedup.Dedup]]'s CC loops (reliable checkpoint when a
    * checkpoint dir is configured, executor-local otherwise). Without
    * it the unrolled plan references the previous round's edge set
    * three times (join base + both endpoint semi-joins), so plan size
    * grows 3^rounds — the optimizer, not the data, becomes the
    * bottleneck.
    */
  private def checkpoint(df: DataFrame): DataFrame =
    graft.Checkpoints.checkpoint(df, eager = false)

  /** `rounds` peeling rounds at threshold `coreK` over an undirected
    * edge list in any orientation (duplicates/self-loops dropped).
    * Returns `(node, degree)` of the surviving subgraph — the exact
    * k-core iff peeling converged within `rounds`.
    */
  def kCoreTruncated(edges: DataFrame, aCol: String, bCol: String,
                     coreK: Int, rounds: Int): DataFrame = {
    require(coreK >= 1 && rounds >= 1)
    val raw = edges.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
    var e = checkpoint(raw.select(least(col("a"), col("b")).as("u"),
      greatest(col("a"), col("b")).as("v")).distinct())
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("degree") >= coreK).select("node")
      e = checkpoint(e
        .join(keep.select(col("node").as("u")), "u")
        .join(keep.select(col("node").as("v")), "v")
        .select("u", "v"))
    }
    degrees(e)
  }
}
