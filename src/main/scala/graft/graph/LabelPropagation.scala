package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) over a weighted directed edge list — the community primitive a
  * crawl-curation pipeline runs on the host/domain graph to group
  * mirrors and content farms before per-community sampling quotas
  * (where [[PageRank]] weights nodes, LPA *partitions* them).
  *
  * Update rule, synchronous (all nodes step together from the previous
  * round's labels — the variant that is deterministic and hence
  * oracle-checkable, unlike the asynchronous original):
  *
  *   label(v, 0) = v
  *   label(v, i) = argmax_l Σ w(u→v) over in-neighbors u with
  *                 label(u, i-1) = l;   ties → smallest l;
  *                 nodes with no in-edges keep their label
  *
  * Determinism: messages are integer weight sums (associative /
  * commutative under any partitioning), and the argmax is a total
  * order (weight desc, label asc) expressed as `max` over a
  * `(wsum, -label)` struct — no floats, no row-order dependence
  * anywhere, so the fixed-iteration trace is bit-identical across
  * engines and partition counts.
  *
  * Scale design (100 TB): the loop is UNROLLED into one declarative
  * plan like [[PageRank.pageRankFixed]] — no per-iteration action. Each
  * iteration shuffles the LABEL table twice (labels⋈edges on src, then
  * the (dst, lbl) message agg — partially aggregated map-side), and the
  * label table is one row per node, orders of magnitude smaller than
  * the edge list; the edge scan itself is served by AQE exchange reuse.
  * The struct-max argmax replaces a per-dst window sort with a plain
  * hash agg — no global or per-partition sort in the loop. Deep
  * iteration counts should checkpoint labels every few rounds (same
  * lineage rationale as [[graft.dedup.Dedup.connectedComponents]]).
  */
object LabelPropagation {

  /** Fixed-iteration synchronous LPA over `(srcCol, dstCol, wCol)`
    * edges. Returns `(node: long, community: long)` after `iterations`
    * rounds, every node in src∪dst present.
    */
  def labelPropagationFixed(edges: DataFrame, srcCol: String,
                            dstCol: String, wCol: String,
                            iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var labels = nodes.withColumn("lbl", col("node"))
    for (_ <- 1 to iterations) {
      val msgs = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(sum(col("w")).as("wsum"))
      val best = msgs.groupBy(col("dst"))
        .agg(max(struct(col("wsum"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("dst"), (-col("m.neg")).as("nl"))
      labels = labels.join(best, labels("node") === best("dst"), "left")
        .select(col("node"), coalesce(col("nl"), col("lbl")).as("lbl"))
    }
    labels.select(col("node"), col("lbl").as("community"))
  }
}
