package graft.etl

import graft.SparkSpec
import graft.etl.Aggregation._

class AggregationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0, 10L), ("a", 2.0, 20L), ("b", 3.0, 30L)
  ).toDF("k", "v", "w")

  test("grouped aggregation with whitelisted functions") {
    val out = sparkAggregate(df, Seq("k"), Seq(
      AggSpec("v", "sum"), AggSpec("w", "max"), AggSpec("v", "count")))
      .orderBy("k").collect()
    assert(out(0).getString(0) == "a" && out(0).getDouble(1) == 3.0
      && out(0).getLong(2) == 20L && out(0).getLong(3) == 2L)
    assert(out(1).getDouble(1) == 3.0 && out(1).getLong(2) == 30L)
  }

  test("empty groups falls back to global aggregation (spec.py:17-21)") {
    val out = sparkAggregate(df, Seq.empty, Seq(AggSpec("v", "sum", Some("total"))))
    assert(out.columns.toSeq == Seq("total"))
    assert(out.head().getDouble(0) == 6.0)
  }

  test("unknown names dispatch through expr — SQL aggregates resolve") {
    val out = sparkAggregate(df, Seq("k"), Seq(AggSpec("v", "median")))
    assert(out.where($"k" === "a").head().getDouble(1) == 1.5)
  }

  test("genuinely unknown function fails at analysis, like getattr would") {
    assertThrows[Exception] {
      sparkAggregate(df, Seq("k"), Seq(AggSpec("v", "no_such_fn_xyz"))).collect()
    }
  }

  test("default output naming is func_column") {
    val out = sparkAggregate(df, Seq("k"), Seq(AggSpec("v", "avg")))
    assert(out.columns.contains("avg_v"))
  }

  test("incremental rollup merge (state + batch re-agg) is bit-equal to " +
    "the from-scratch rollup — the mergeable-representation invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val o = graft.model.Tables.orders(spark, sf()).select(
      col("o_orderkey"), col("o_orderpriority"),
      year(col("o_orderdate")).cast("int").as("o_year"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"), col("o_year"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val merged = rollup(o.where(col("o_orderkey") % 10 =!= 7))
      .unionByName(rollup(o.where(col("o_orderkey") % 10 === 7)))
      .groupBy(col("o_orderpriority"), col("o_year"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
    val full = rollup(o)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }
}
