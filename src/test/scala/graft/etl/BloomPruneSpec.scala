package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class BloomPruneSpec extends SparkSpec {

  test("prunedJoin is row-identical to the plain join") {
    val probe = Tables.events(spark, sf()).select("event_id", "user_id")
    val build = Tables.customer(spark, sf())
      .where(col("c_acctbal") > 5000).select("c_custkey", "c_name")
    val pruned = BloomPrune.prunedJoin(probe, build, "user_id", "c_custkey")
      .select("event_id", "c_custkey")
    val plain = probe.join(build, col("user_id") === col("c_custkey"))
      .select("event_id", "c_custkey")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(pruned).count() === 0)
  }

  test("prunedJoin works when probe and build key columns share a name") {
    import spark.implicits._
    val probe = Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("k", "pv")
    val build = Seq((2L, "b2"), (3L, "b3"), (4L, "b4")).toDF("k", "bv")
    val out = BloomPrune.prunedJoin(probe, build, "k", "k")
    assert(out.select("pv", "bv").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("p2", "b2"), ("p3", "b3")))
  }

  test("the bloom filter actually prunes most non-matching probe rows") {
    import spark.implicits._
    val probe = (1L to 10000L).map(i => (i, i)).toDF("pid", "k")
    val build = (1L to 100L).map(i => (i * 97, s"v$i")).toDF("k2", "v")
    val aggExpr = new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        org.apache.spark.sql.graft.bridge.expression(xxhash64(col("k2"))),
        org.apache.spark.sql.catalyst.expressions.Literal(1000000L),
        org.apache.spark.sql.catalyst.expressions.Literal(8388608L))
      .toAggregateExpression()
    val bloomBytes = build.agg(
      org.apache.spark.sql.graft.bridge.column(aggExpr)).head().getAs[Array[Byte]](0)
    val kept = probe.where(org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graft.bridge.expression(xxhash64(col("k"))))))
      .count()
    // ~103 true keys in range; FPR at 8M bits / 100 items is ~0
    assert(kept < 500, s"bloom kept $kept of 10000 — not selective")
  }
}
