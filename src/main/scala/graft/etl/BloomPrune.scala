package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Bloom-filter join pruning: when a join's build side is selective,
  * shuffle-joining the full probe side wastes almost all of its I/O.
  * Build a Bloom filter over the build-side keys (`bloom_filter_agg`,
  * a distributed aggregate — no driver collect), broadcast the one-row
  * sketch, and pre-filter the probe side with `might_contain` before
  * the exact join. False positives only let extra rows into the exact
  * join, which drops them — the result is row-identical to the plain
  * join; the win is shuffle volume ∝ selectivity at 100 TB. (Spark's
  * own runtime row-level filtering does this adaptively;
  * the explicit form makes the plan deterministic and tunable.)
  */
object BloomPrune {

  /** Probe-side rows whose `probeKey` might be in `build.buildKey`,
    * then exactly joined. Row-identical to the plain inner equi-join.
    */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8388608L): DataFrame = {
    // bloom_filter_agg / might_contain are internal (runtime-filter)
    // expressions without public SQL names — construct them directly.
    // The sketch aggregates distributed, lands on the driver as ONE
    // binary row (bounded by numBits — a model, not data), and inlines
    // as a literal: might_contain requires a constant bloom argument.
    val aggExpr = new BloomFilterAggregate(
      bridge.expression(xxhash64(col(buildKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomBytes = build.agg(bridge.column(aggExpr).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    val pruned =
      if (bloomBytes == null) probe.limit(0) // empty build side
      else probe.where(bridge.column(BloomFilterMightContain(
        Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
        bridge.expression(xxhash64(col(probeKey))))))
    // alias both sides: with equal key names an unqualified
    // col(probeKey) === col(buildKey) is AMBIGUOUS_REFERENCE
    pruned.alias("__probe").join(build.alias("__build"),
      col(s"__probe.$probeKey") === col(s"__build.$buildKey"))
  }
}
