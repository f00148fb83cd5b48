package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * data-quality gate an ingest pipeline runs BEFORE admitting a batch:
  * a feature whose distribution shifted (scrape source went bad, a
  * format change truncated documents) should fail loudly at ingest,
  * not silently skew the training mix.
  *
  * Population Stability Index over fixed-width feature buckets:
  * `PSI = Σ_b (p_new(b) - p_old(b)) · ln(p_new(b) / p_old(b))`, the
  * standard industry drift score (PSI < 0.1 stable, > 0.25 shifted).
  * Buckets are FIXED-WIDTH by spec (width/cap parameters), not
  * quantile-derived — deterministic across engines and snapshots, so
  * scores are comparable over time; add-1 smoothing over the bucket
  * domain keeps empty buckets finite.
  *
  * Scale shape: one pass over the union of both snapshots (a flag
  * column, conditional counts — the DSIR counting pattern), bucket
  * totals via an unpartitioned window over the aggregated bucket table
  * (bucket-domain-sized, never the corpus — plan-audited to a single
  * FileScan); output is bucket-domain-sized. Each PSI term is a
  * single deterministic scalar
  * expression over exact integer counts (no cross-row float sum), so
  * the output is partition-order-invariant and engine-portable as-is.
  */
object Drift {

  /** Per-bucket PSI contributions between the `isOld` and `isNew`
    * slices of `df` (a row may belong to neither; flags are disjoint by
    * contract). `featureCol` buckets as
    * `least(greatest(floor(feature / bucketWidth), 0), maxBucket)` —
    * out-of-range features clamp into the edge buckets, so a negative
    * value can't silently grow the domain past the `nB` used for add-1
    * smoothing. Returns (bucket, n_old, n_new, psi_term) for EVERY
    * bucket 0..maxBucket — empty buckets emit their smoothing-only
    * term, so the total is the full-domain add-1 PSI and is independent
    * of rows outside both slices (a bucket fed only by neither-slice
    * rows scores identically to an absent one). Total PSI = downstream
    * sum over the fixed nB rows.
    */
  def psiByBucket(df: DataFrame, featureCol: String, isOld: Column,
                  isNew: Column, bucketWidth: Int,
                  maxBucket: Int): DataFrame = {
    require(bucketWidth > 0 && maxBucket > 0, "need positive bucket spec")
    val nB = maxBucket + 1
    val observed = df
      .select(least(greatest(floor(col(featureCol) / bucketWidth), lit(0)),
          lit(maxBucket)).cast("int").as("bucket"),
        isOld.as("__o"), isNew.as("__n"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__o"), lit(1L)).otherwise(lit(0L))).as("n_old"),
        sum(when(col("__n"), lit(1L)).otherwise(lit(0L))).as("n_new"))
    // complete the bucket domain with zero rows (union + tiny re-agg —
    // ≤ 2·nB rows, no join operator to disturb the single-scan plan):
    // all-empty buckets must still contribute their smoothing term
    val domain = df.sparkSession.range(nB)
      .select(col("id").cast("int").as("bucket"),
        lit(0L).as("n_old"), lit(0L).as("n_new"))
    val counts = observed.unionByName(domain)
      .groupBy(col("bucket"))
      .agg(sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"))
    // totals as an unpartitioned window over the ALREADY-AGGREGATED
    // bucket table (≤ nB rows on one task — bucket-domain-sized, never
    // the corpus): a separate `counts.agg(...)` branch would re-derive
    // the whole subtree and SCAN THE CORPUS TWICE in the static plan
    // (PlanAuditSpec pins the single FileScan)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val withTotals = counts
      .withColumn("t_old", sum(col("n_old")).over(w))
      .withColumn("t_new", sum(col("n_new")).over(w))
    val pOld = (col("n_old") + 1) / (col("t_old") + lit(nB))
    val pNew = (col("n_new") + 1) / (col("t_new") + lit(nB))
    withTotals
      .select(col("bucket"), col("n_old"), col("n_new"),
        round((pNew - pOld) * log(pNew / pOld), 6).as("psi_term"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `aPred` and
    * `bPred` slices of `df` — the distribution-free drift test that
    * complements [[psiByBucket]]: PSI needs a bucket spec and reacts to
    * mass reshuffling; KS is bucket-free and reads the WORST point of
    * CDF divergence, so it catches a shifted median the coarse buckets
    * blur. Returns one row: the KS statistic, the value where the gap
    * peaks, and the exact integer numerator (D = d_num / (n_a·n_b)).
    *
    * Exactness: both empirical CDFs are kept as INTEGER cumulative
    * counts and compared via the cross-multiplied gap
    * |F_a·n_b − F_b·n_a| — one division at the very end, so the
    * statistic (and the argmax value, ties → smallest v) is
    * partition-order-invariant and engine-exact. Rows in neither slice
    * are excluded up front — they'd otherwise pad the distinct-value
    * grid and could shift the tie-broken argmax between engines.
    *
    * Scale shape: one hash agg to per-distinct-value counts, then a
    * HIERARCHICAL prefix sum — within-bucket window partitioned by
    * `floor(v)` plus a bucket-level offset window over the
    * bucket-count table (≪ values, broadcast back) — so no global
    * single-partition sort ever materializes (the two-pass pattern of
    * the scalable mixers); the final argmax is a bounded-heap top-1.
    */
  def ksDistance(df: DataFrame, valueCol: String, aPred: Column,
                 bPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // checkpoint pin (reliable-dir-aware, [[graft.Checkpoints]]): three
    // consumers (within-bucket prefix, bucket offsets, totals) read the
    // distinct-value table — pinning it keeps the corpus scan single
    // (no DataFrame common-subtree reuse); the pinned table is
    // |distinct values| rows
    val t = graft.Checkpoints.checkpoint(df.where(aPred || bPred)
      .select(col(valueCol).as("v"),
        when(aPred, 1L).otherwise(0L).as("ca"),
        when(bPred, 1L).otherwise(0L).as("cb"))
      .groupBy(col("v")).agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      .withColumn("__bkt", floor(col("v")).cast("long")))
    val inW = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = t.select(col("__bkt"), col("v"),
      sum(col("ca")).over(inW).as("la"), sum(col("cb")).over(inW).as("lb"))
    val bktW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col("__bkt"))
      .agg(sum(col("ca")).as("ba"), sum(col("cb")).as("bb"))
      .select(col("__bkt"),
        coalesce(sum(col("ba")).over(bktW), lit(0L)).as("oa"),
        coalesce(sum(col("bb")).over(bktW), lit(0L)).as("ob"))
    val n = t.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    within.join(broadcast(offsets), "__bkt")
      .crossJoin(broadcast(n))
      .select(col("v"),
        abs((col("la") + col("oa")) * col("nb") -
          (col("lb") + col("ob")) * col("na")).as("d_num"),
        col("na"), col("nb"))
      .orderBy(col("d_num").desc, col("v").asc).limit(1)
      .select(col("v").as("at_value"), col("d_num"),
        col("na").as("n_a"), col("nb").as("n_b"),
        // int/int ratio: boundary-exact round-6 (r16 sweep)
        graft.text.TextAnalysis.exactRound6Ratio(col("d_num"),
          col("na") * col("nb")).as("ks_d"))
  }
}
