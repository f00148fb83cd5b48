package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

/** Sampling operators (training-data pipelines downsample constantly):
  * seeded Bernoulli `sample` and stratified `sampleBy`. Engine-internal
  * RNG means no DuckDB oracle — the contract here is determinism for a
  * fixed seed and statistically sane fractions.
  */
class SamplingSpec extends SparkSpec {

  test("sample(fraction, seed) is deterministic and near the target fraction") {
    val e = Tables.events(spark, sf())
    val a = e.sample(withReplacement = false, 0.2, seed = 42L)
    val b = e.sample(withReplacement = false, 0.2, seed = 42L)
    assert(a.collect().map(_.getLong(0)).toSeq ===
      b.collect().map(_.getLong(0)).toSeq, "same seed, same sample")
    val frac = a.count().toDouble / e.count()
    assert(frac > 0.1 && frac < 0.3, s"fraction $frac far from 0.2")
  }

  test("Sampling.stratifiedSample is invariant under repartitioning " +
    "(the property rand(seed) lacks) and honors per-stratum rates") {
    val d = graft.model.Tables.documents(spark, sf())
      .select("doc_id", "source", "n_chars")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "doc_id", "source",
        rates = Map("src0" -> 80, "src1" -> 0), defaultRate = 20,
        salt = "mix1")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(d)
    assert(base == ids(d.repartition(13)), "sample must not depend on layout")
    assert(base == ids(d.orderBy(col("n_chars"))), "nor on row order")
    val bySrc = Sampling.stratifiedSample(d, "doc_id", "source",
      Map("src0" -> 80, "src1" -> 0), 20, "mix1")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src1"), "rate 0 drops the stratum")
    val totals = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val f0 = bySrc("src0").toDouble / totals("src0")
    assert(f0 > 0.55 && f0 < 1.0, s"src0 fraction $f0 far from 0.8")
  }

  test("sampleBy stratifies: per-key fractions honored") {
    val e = Tables.events(spark, sf()).select("event_id", "event_type")
    val fractions = Map("click" -> 0.5, "error" -> 0.1, "purchase" -> 0.0,
      "signup" -> 1.0, "view" -> 0.0)
    val s = e.stat.sampleBy("event_type", fractions, seed = 42L)
    val counts = s.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = e.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("purchase") && !counts.contains("view"))
    assert(counts("signup") === totals("signup"), "fraction 1.0 keeps all")
    val clickFrac = counts("click").toDouble / totals("click")
    assert(clickFrac > 0.3 && clickFrac < 0.7, s"click fraction $clickFrac")
  }

  test("tokenBudgetMix keeps a deterministic per-stratum prefix meeting " +
    "the token floor, invariant to input partitioning") {
    val docs = Tables.documents(spark, sf("sf0.01"))
      .select("doc_id", "source", "text")
    val kept = Sampling.tokenBudgetMix(docs, "doc_id", "text", "source", 600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    for ((src, rows) <- kept.groupBy(_._1)) {
      val total = rows.map(_._3).sum
      assert(total >= 600, s"$src kept only $total tokens (budget floor)")
    }
    assert(kept.length < docs.count(), "budget must be selective here")
    // reproducible shuffle: a repartition must not change the sample
    val kept2 = Sampling.tokenBudgetMix(
      docs.repartition(13), "doc_id", "text", "source", 600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(kept2 == kept.toSet)
    // the two-pass distributed prefix sum is bit-equal to the window
    // form (the packSequencesScalable proof, for the mix order)
    val scalable = Sampling.tokenBudgetMixScalable(
      docs, "doc_id", "text", "source", 600L, numParts = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(scalable == kept.toSet)
  }
}
