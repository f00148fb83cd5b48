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
}
