package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

/** Accuracy bounds for the sketch aggregates (rows-only in the oracle
  * gate — HLL++/KLL internals are engine-specific, so correctness here
  * means bounded error vs the exact answer).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 15% (3x default rsd) of exact") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"))).collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    info(f"exact=$exact approx=$approx err=${err * 100}%.2f%%")
    assert(err < 0.15) // default rsd = 5%; 3 sigma bound
  }

  test("percentile_approx(0.5) within 2% of the exact median") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .collect().head.getDouble(0)
    val approx = li.select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    val err = math.abs(approx - exact) / exact
    info(f"exact=$exact%.2f approx=$approx%.2f err=${err * 100}%.2f%%")
    assert(err < 0.02)
  }
}
