package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the corpus-mixing step of a
  * training-data pipeline (per-source/per-language keep rates, e.g.
  * upsample books, downsample crawl).
  *
  * The keep decision derives from md5 of the row key, NOT `rand()`:
  *  - reproducible across runs, cluster sizes, and partitionings
  *    (`rand(seed)` is seeded per partition — a repartition changes
  *    the sample);
  *  - engine-portable, so the DuckDB oracle computes the identical
  *    bucket and the sample is hash-verifiable row-for-row;
  *  - stable under incremental reprocessing: a row's fate never
  *    changes, so re-running over a grown corpus keeps the old
  *    sample (the property dataset versioning needs).
  *
  * Map-only: no shuffle, no state; at 100 TB this is a free rider on
  * whatever scan already runs.
  */
object Sampling {

  /** Uniform-ish bucket in [0, 100): first 8 md5 hex digits of
    * `key:salt` as an integer, mod 100. Change `salt` to draw an
    * independent sample.
    */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long") % 100

  /** Keep each row iff its bucket falls under its stratum's percent
    * rate (`rates` by stratum value, `defaultRate` otherwise). Adds
    * the bucket as `strat_bucket` so downstream audits can re-check
    * the decision.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultRate: Int,
                       salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("strat_bucket", hashBucket(col(keyCol), salt))
      .where(col("strat_bucket") < rate)
  }

  /** Token-budget corpus mixing — rate-based sampling controls DOC
    * share, but training mixes are specified in TOKENS: keep documents
    * of each stratum, in deterministic md5-of-id order (a reproducible
    * shuffle — same properties as [[hashBucket]]: partition-,
    * cluster-, and rerun-invariant), until the stratum's token budget
    * is met. A doc is kept iff its EXCLUSIVE prefix token sum is below
    * the budget, so the doc that crosses the boundary is included and
    * every stratum with ≥ budget tokens yields at least `budget` kept
    * tokens (budgets are floors, standard for mixture specs).
    *
    * Scale shape: one window per stratum — the [[graft.text.TextAnalysis.packSequences]]
    * trade; for few giant strata the same two-pass distributed prefix
    * sum ([[graft.text.TextAnalysis.packSequencesScalable]]) computes
    * the identical ordering without a single-task stratum sort.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
                     strataCol: String, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(strataCol), col(idCol),
        graft.text.TextAnalysis.tokenCount(col(textCol)).as("n_toks"),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .where(col("__before") < budgetTokens)
      .select(col(strataCol), col(idCol), col("n_toks"))
  }

  /** [[tokenBudgetMix]] at 100 TB — the same two-pass distributed
    * prefix sum as `TextAnalysis.packSequencesScalable`, over the
    * (stratum, md5-hash, id) order: pass 1 range-partitions so one
    * stratum spans many partitions (each locally sorted) and computes
    * per-partition local exclusive sums; pass 2 broadcasts the tiny
    * per-(partition, stratum) subtotals back as offsets. No stratum is
    * ever sorted on a single task — the window form's failure mode
    * when a stratum is 10 TB. Bit-equal to the window form
    * (SamplingSpec).
    */
  def tokenBudgetMixScalable(df: DataFrame, idCol: String, textCol: String,
                             strataCol: String, budgetTokens: Long,
                             numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val toks = df.select(col(strataCol), col(idCol),
        graft.text.TextAnalysis.tokenCount(col(textCol)).as("n_toks"),
        md5(col(idCol).cast("string")).as("__h"))
      .repartitionByRange(numParts, col(strataCol), col("__h"), col(idCol))
      .sortWithinPartitions(col(strataCol), col("__h"), col(idCol))
    val withPid = toks.withColumn("__pid", spark_partition_id())
    val schema = StructType(withPid.schema.fields :+
      StructField("__local_excl", LongType, nullable = false))
    val local = spark.createDataFrame(
      withPid.rdd.mapPartitions { it =>
        var stratum: Any = null
        var running = 0L
        it.map { r =>
          if (r.get(0) != stratum) { stratum = r.get(0); running = 0L }
          val excl = running
          running += r.getInt(2)
          Row(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), excl)
        }
      }, schema)
    val subtotal = local.groupBy(col("__pid"), col(strataCol))
      .agg(sum(col("n_toks")).as("__part_total"))
    val offsetW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = subtotal
      .withColumn("__offset",
        coalesce(sum(col("__part_total")).over(offsetW), lit(0L)))
      .select(col("__pid"), col(strataCol), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid", strataCol))
      .where(col("__local_excl") + col("__offset") < budgetTokens)
      .select(col(strataCol), col(idCol), col("n_toks"))
  }
}
