package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the CCNet/fastText-style step
  * real corpus pipelines run after the rule-based gates: a logistic
  * regression over hashed token features, trained distributed, scoring
  * map-only. (Public shape: Wenzek et al. 2020 "CCNet" trains a linear
  * model to rank crawl text against a clean target; fastText's
  * classifier is the same linear-over-hashed-ngrams idea.)
  *
  * Design for determinism AND 100 TB:
  *  - features: token → md5-derived bucket in [0, numBuckets) (the
  *    [[graft.etl.Sampling.hashBucket]] arithmetic — any engine can
  *    re-derive it; at real scale swap in xxhash64 for cheapness, the
  *    plan shape is identical). A doc's margin is
  *    `bias + (Σ_t w[bucket(t)]) / n_toks`.
  *  - every cross-row float reduction is a MICRO-UNIT LONG sum
  *    (contributions rounded to 1e-9 units, summed exactly), so
  *    training produces BIT-IDENTICAL weights whatever the partition
  *    order or count — the property that makes the trained model
  *    oracle-checkable and cluster-reproducible.
  *  - training reads the corpus ONCE (tokenize + hash + optional
  *    content-hash sampling into a persisted bucket-array projection);
  *    each GD iteration then runs one scoring pass (broadcast weights
  *    as a literal array — model size = numBuckets doubles, the
  *    k-means-centroids precedent for driver-held model state) and one
  *    explode + hash agg keyed on the bucket for gradients (map-side
  *    partial sums; the shuffle carries ≤ numBuckets × partitions
  *    rows) over the SAMPLE-sized cache. No driver-side per-row loops;
  *    the driver holds only the weight vector.
  */
object QualityClassifier {

  /** md5-derived feature bucket — engine-portable (DuckDB twin:
    * `CAST(('0x' || substr(md5(t), 1, 8)) AS UBIGINT) % numBuckets`).
    */
  def featureBucket(token: Column, numBuckets: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % numBuckets

  /** The per-doc feature-bucket array: tokenize once, hash each token
    * to its bucket once — every training/scoring consumer works off
    * bucket ids, so the (comparatively expensive) tokenization + md5
    * arithmetic runs exactly once per row per plan, not once per use.
    */
  private def bucketArray(textCol: Column, numBuckets: Int): Column =
    transform(TextAnalysis.tokens(textCol),
      t => featureBucket(t, numBuckets).cast("int"))

  /** Margin `bias + (Σ_t w[bucket(t)]) / n_toks` over a precomputed
    * bucket-id array, with the weight sum as an exact micro-unit long
    * fold (array order — deterministic; DuckDB reproduces it as an
    * integer SUM over unnested tokens, order-free because integer
    * addition commutes exactly).
    */
  private def marginFromBuckets(bks: Column, weights: Array[Double],
                                bias: Double): Column = {
    val wMicro = array(weights.map(w =>
      lit(math.rint(w * 1e9).toLong)): _*)
    val sumMicro = aggregate(bks, lit(0L),
      (acc, b) => acc + element_at(wMicro, b + 1))
    // bias enters micro-rounded too, so an engine scoring from the
    // materialized micro-unit model reproduces the margin bit-for-bit
    lit(math.rint(bias * 1e9) / 1e9) +
      (sumMicro.cast("double") / 1e9) / size(bks)
  }

  private def margin(textCol: Column, weights: Array[Double], bias: Double,
                     numBuckets: Int): Column =
    marginFromBuckets(bucketArray(textCol, numBuckets), weights, bias)

  /** `sampleMod` for a fixed-size training sample: CCNet-style
    * pipelines train the linear filter on a SAMPLE, never the corpus —
    * keep ~`target` docs whatever the corpus size (the
    * [[graft.similarity.Similarity.trainSampleModFor]] precedent).
    */
  def sampleModFor(corpusRows: Long, target: Long): Long =
    math.max(1L, corpusRows / math.max(1L, target))

  /** Train by gradient descent: `iters` passes over the (optionally
    * hash-sampled) training set. Returns (weights, bias). `label` is
    * the boolean target (true = looks like the clean corpus).
    * Deterministic: gradients accumulate as micro-unit longs keyed on
    * the feature bucket, so the weights are bit-identical whatever the
    * partitioning.
    *
    * Scale shape: ONE corpus pass tokenizes, hashes and (with
    * `sampleMod > 1`) content-hash-samples the input down to a
    * persisted `(label, bucket-array)` projection — the only
    * corpus-sized scan in the whole run. Each GD iteration then reads
    * the sample-sized cache twice (scoring pass + bucket-keyed
    * gradient agg with map-side partial sums; the shuffle carries
    * ≤ numBuckets × partitions rows). At 100 TB: fix the sample size
    * via [[sampleModFor]] and training cost is one corpus scan plus
    * iters × sample-sized passes — flat in the corpus beyond the scan.
    * The xxhash64-of-content sample decision is engine-reproducible
    * and needs no id column.
    */
  def train(df: DataFrame, textCol: String, label: Column,
            numBuckets: Int = 256, iters: Int = 3,
            learnRate: Double = 2.0, sampleMod: Long = 1L): (Array[Double], Double) = {
    val base = df.select(col(textCol).as("__text"),
      label.cast("int").as("__y"))
    val sampled = if (sampleMod > 1)
      base.where(pmod(xxhash64(col("__text")), lit(sampleMod)) === 0)
    else base
    val feats = sampled
      .select(col("__y"), bucketArray(col("__text"), numBuckets).as("__bks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count().toDouble // forces the one corpus-sized scan
      require(n > 0, "training sample is empty — lower sampleMod")
      var w = Array.fill(numBuckets)(0.0)
      var bias = 0.0
      for (_ <- 0 until iters) {
        val resid = feats
          .withColumn("__p",
            lit(1.0) / (lit(1.0) + exp(-marginFromBuckets(col("__bks"), w, bias))))
          .withColumn("__r", col("__p") - col("__y")) // dL/dz per doc
          .withColumn("__nt", size(col("__bks")))
        // bias gradient: exact micro-long sum of residuals
        val gb = resid.agg(sum(round(col("__r") * 1e9).cast("long")))
          .head().getLong(0) / 1e9
        // per-bucket gradient: residual/n_toks per token occurrence,
        // micro-long partial sums merge across the one shuffle
        val grads = resid
          .select(col("__r"), col("__nt"), explode(col("__bks")).as("__b"))
          .groupBy(col("__b"))
          .agg(sum(round(col("__r") / col("__nt") * 1e9).cast("long"))
            .as("__g"))
          .collect().map(r => r.getInt(0) -> r.getLong(1) / 1e9)
          .toMap
        w = w.indices.map(b =>
          w(b) - learnRate * grads.getOrElse(b, 0.0) / n).toArray
        bias = bias - learnRate * gb / n
      }
      (w, bias)
    } finally feats.unpersist()
  }

  /** Map-only scoring with a trained model: per-doc probability (6 dp)
    * and the keep decision at `threshold`. `keep` columns pass through
    * unchanged (e.g. a label for downstream calibration) so consumers
    * don't re-join on the id.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Array[Double], bias: Double, numBuckets: Int,
            threshold: Double, keepCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: keepCols.map(col) ++: Seq(
        round(lit(1.0) / (lit(1.0) +
          exp(-margin(col(textCol), weights, bias, numBuckets))), 6)
          .as("p_quality")): _*)
      .withColumn("keep", col("p_quality") >= threshold)
}
