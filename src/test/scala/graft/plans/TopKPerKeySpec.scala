package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class TopKPerKeySpec extends SparkSpec {

  test("topKPerKey matches the row_number window formulation") {
    val base = Tables.events(spark, sf()).select("user_id", "event_id", "value")

    val custom = TopKPerKey.topKPerKey(base, Seq("user_id"),
      Seq("value" -> true, "event_id" -> false), 3)

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val expected = base
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)

    assert(custom.columns.toSeq === Seq("user_id", "event_id", "value", "rank"))
    assert(custom.count() === expected.count())
    assert(custom.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(custom).count() === 0)
  }

  test("topKPerKey k=1 returns one best row per key") {
    val base = Tables.events(spark, sf()).select("user_id", "event_id", "value")
    val custom = TopKPerKey.topKPerKey(base, Seq("user_id"),
      Seq("value" -> true, "event_id" -> false), 1)
    val nUsers = base.select("user_id").distinct().count()
    assert(custom.count() === nUsers)
    assert(custom.select("rank").distinct().collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("physical plan uses partial+final topk, not sort+window") {
    val base = Tables.events(spark, sf()).select("user_id", "event_id", "value")
    val custom = TopKPerKey.topKPerKey(base, Seq("user_id"),
      Seq("value" -> true), 2)
    val physical = custom.queryExecution.executedPlan.toString
    assert(physical.contains("FinalTopK") && physical.contains("PartialTopK"))
    assert(!physical.contains("WindowExec"))
  }
}
