package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) splits
  * oversized partitions at runtime and is the first line of defense;
  * explicit salting is the deterministic fallback when a single JOIN KEY
  * (not just a partition) is hot — e.g. one card number generating 1% of
  * 100 TB — because no partition split can separate rows that share a
  * key.
  *
  * `saltedEquiJoin` spreads each key of the large side over `numSalts`
  * shuffle sub-keys and replicates the matching small-side rows across
  * all salt values, so a hot key's rows land on `numSalts` reducers
  * instead of one. Equivalent to the plain equi-join row-for-row
  * (verified against a DuckDB oracle and a plain-join spec).
  */
object Skew {

  /** Inner equi-join of `large ⋈ small` on `largeKey == smallKey`, with
    * the large side salted into `numSalts` sub-keys. The small side is
    * exploded ×numSalts (only acceptable because it is small — that
    * asymmetry is the point of the pattern).
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame,
                     largeKey: String, smallKey: String,
                     numSalts: Int): DataFrame = {
    // salt derivation must not depend on the join key (that would undo
    // the spread); a per-row id mod numSalts is uniform and cheap
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated,
      salted(largeKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Key-skew PROFILER — the diagnostic that decides whether a join or
    * aggregation on `keyCol` needs [[saltedEquiJoin]] / AQE skew
    * handling at all, answered from data instead of folklore. Reports
    * the `k` hottest keys (count, parts-per-million share, cumulative
    * share) alongside the key-count distribution (distinct keys, total
    * rows, exact p50/p99 of per-key counts, max), the skew ratio
    * (hottest key vs mean — the "one card number is 1% of 100 TB"
    * number), and `suggested_salts` = ⌈skew ratio⌉, the salt factor
    * that levels the hot key to roughly the mean reducer load.
    *
    * Scale shape: one hash agg over the data (map-side combined), then
    * everything downstream operates on the KEY-COUNT table (|keys| ≪
    * |rows|): a 1-row stats agg broadcast back, a bounded-heap top-k
    * (`TakeOrderedAndProject`), and a k-row running sum. Deterministic:
    * shares are integer `div` ppm, the two doubles (skew ratio, p50/p99
    * interpolation) are single divisions/order-statistics rounded to
    * 6 dp — no accumulation-order term.
    */
  def skewProfile(df: DataFrame, keyCol: String, k: Int,
                  maxPinnedInputRows: Long = 1000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Pin: the stats and top-k branches both consume the key-count
    // table; without pinning it, each branch would re-derive the
    // subtree and the CORPUS would scan twice (DataFrames have no
    // common-subtree reuse). The pin's STORAGE is gated by plan stats
    // (the [[Aggregation.rfmScores]] pattern, VERDICT r12 optional #6):
    // while the INPUT plan bound (exact stats.rowCount when available,
    // else a bytes/4 heuristic; keys ≤ rows, so it upper-bounds the
    // pinned table conservatively) stays under `maxPinnedInputRows`,
    // a reliable-dir-aware checkpoint ([[graft.Checkpoints]]) holds it
    // in executor storage memory — the profiling regime, |keys| ≪
    // |rows|. Above the bound — the billion-key profile — the pin is
    // persist(DISK_ONLY) instead, so it SPILLS rather than evicting
    // hot blocks under memory pressure (an evicted checkpoint block is
    // a recompute of the whole corpus agg). Both pins are exact; a
    // stats mis-gate can only cost read-back speed, never results.
    val countsRaw = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val planStats = df.queryExecution.optimizedPlan.stats
    val planBound: BigInt =
      planStats.rowCount.getOrElse(planStats.sizeInBytes / 4)
    val counts =
      if (planBound <= BigInt(maxPinnedInputRows))
        graft.Checkpoints.checkpoint(countsRaw)
      else countsRaw.persist(
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      round(expr("percentile(cnt, 0.5)"), 6).as("p50_cnt"),
      round(expr("percentile(cnt, 0.99)"), 6).as("p99_cnt"))
    val order = Seq(col("cnt").desc, col("key").asc)
    // rank/cumulative windows run over k rows only (post-limit)
    val w = Window.orderBy(order: _*)
    counts.orderBy(order: _*).limit(k)
      .select(col("key"), col("cnt"),
        row_number().over(w).cast("int").as("rank"),
        sum(col("cnt")).over(w).as("cum_cnt"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("cnt"),
        expr("cnt * 1000000 div total_rows").as("share_ppm"),
        expr("cum_cnt * 1000000 div total_rows").as("cum_share_ppm"),
        col("n_keys"), col("total_rows"), col("p50_cnt"), col("p99_cnt"),
        col("max_cnt"),
        // int/int ratio: boundary-exact round-6 (r16 sweep)
        graft.text.TextAnalysis.exactRound6Ratio(
          col("max_cnt") * col("n_keys"), col("total_rows"))
          .as("skew_ratio"),
        greatest(lit(1L),
          expr("(max_cnt * n_keys + total_rows - 1) div total_rows"))
          .as("suggested_salts"))
  }
}
