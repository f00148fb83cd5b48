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
  *  - per iteration: one linear pass to score docs (broadcast weights
  *    as a literal array — model size = numBuckets doubles, the
  *    k-means-centroids precedent for driver-held model state), one
  *    explode + hash agg keyed on the bucket for gradients (map-side
  *    partial sums; the shuffle carries ≤ numBuckets × partitions
  *    rows). No driver-side per-row loops; the driver holds only the
  *    weight vector.
  */
object QualityClassifier {

  /** md5-derived feature bucket — engine-portable (DuckDB twin:
    * `CAST(('0x' || substr(md5(t), 1, 8)) AS UBIGINT) % numBuckets`).
    */
  def featureBucket(token: Column, numBuckets: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % numBuckets

  /** Margin `bias + (Σ_t w[bucket(t)]) / n_toks` with the weight sum
    * as an exact micro-unit long fold over the token array (array
    * order — deterministic; DuckDB reproduces it as an integer SUM
    * over unnested tokens, order-free because integer addition
    * commutes exactly).
    */
  private def margin(textCol: Column, weights: Array[Double], bias: Double,
                     numBuckets: Int): Column = {
    val wMicro = array(weights.map(w =>
      lit(math.rint(w * 1e9).toLong)): _*)
    val toks = TextAnalysis.tokens(textCol)
    val sumMicro = aggregate(toks, lit(0L),
      (acc, t) => acc + element_at(wMicro,
        (featureBucket(t, numBuckets) + 1).cast("int")))
    // bias enters micro-rounded too, so an engine scoring from the
    // materialized micro-unit model reproduces the margin bit-for-bit
    lit(math.rint(bias * 1e9) / 1e9) +
      (sumMicro.cast("double") / 1e9) / size(toks)
  }

  /** Train by full-batch gradient descent: `iters` passes, each ONE
    * scoring pass + ONE gradient aggregation over the corpus. Returns
    * (weights, bias). `labelCol` is the boolean target (true = looks
    * like the clean corpus). Deterministic: gradients accumulate as
    * micro-unit longs keyed on the feature bucket.
    */
  def train(df: DataFrame, textCol: String, label: Column,
            numBuckets: Int = 256, iters: Int = 3,
            learnRate: Double = 2.0): (Array[Double], Double) = {
    var w = Array.fill(numBuckets)(0.0)
    var bias = 0.0
    val n = df.count().toDouble
    for (_ <- 0 until iters) {
      val resid = df.select(col(textCol).as("__text"),
          label.cast("int").as("__y"))
        .withColumn("__p",
          lit(1.0) / (lit(1.0) + exp(-margin(col("__text"), w, bias,
            numBuckets))))
        .withColumn("__r", col("__p") - col("__y")) // dL/dz per doc
        .withColumn("__nt", TextAnalysis.tokenCount(col("__text")))
      // bias gradient: exact micro-long sum of residuals
      val gb = resid.agg(sum(round(col("__r") * 1e9).cast("long")))
        .head().getLong(0) / 1e9
      // per-bucket gradient: residual/n_toks per token occurrence,
      // micro-long partial sums merge across the one shuffle
      val grads = resid
        .select(col("__r"), col("__nt"),
          explode(TextAnalysis.tokens(col("__text"))).as("__t"))
        .groupBy(featureBucket(col("__t"), numBuckets).as("__b"))
        .agg(sum(round(col("__r") / col("__nt") * 1e9).cast("long"))
          .as("__g"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1) / 1e9)
        .toMap
      w = w.indices.map(b =>
        w(b) - learnRate * grads.getOrElse(b, 0.0) / n).toArray
      bias = bias - learnRate * gb / n
    }
    (w, bias)
  }

  /** Map-only scoring with a trained model: per-doc probability (6 dp)
    * and the keep decision at `threshold`.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Array[Double], bias: Double, numBuckets: Int,
            threshold: Double): DataFrame =
    df.select(col(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-margin(col(textCol), weights, bias, numBuckets))), 6)
          .as("p_quality"))
      .withColumn("keep", col("p_quality") >= threshold)
}
