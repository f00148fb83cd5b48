package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class TopKRewriteSpec extends SparkSpec {

  private def rankQuery(k: Int) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    Tables.events(spark, sf()).select("user_id", "event_id", "value")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
  }

  test("Filter(row_number <= k) over Window is rewritten to the heap operator") {
    TopKPerKey.ensureRegistered(spark)
    val df = rankQuery(3)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("FinalTopK"), physical)
    assert(!physical.contains("WindowExec"), physical)
  }

  test("rewritten plan returns exactly the unrewritten result") {
    TopKPerKey.ensureRegistered(spark)
    val rewritten = rankQuery(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // compute the reference result without the rule
    val clean = spark.newSession()
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val expected = Tables.events(clean, sf()).select("user_id", "event_id", "value")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rewritten === expected)
  }

  test("GLOBAL top-k (empty partitionSpec) is correct over multi-partition input") {
    TopKPerKey.ensureRegistered(spark)
    import spark.implicits._
    // 4 partitions, values interleaved so each partition's local top-3
    // differs from the global top-3 — a per-partition bug would emit 12 rows
    val df = (1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toDouble))
      .toDF("id", "score").repartition(4)
    val w = Window.orderBy(col("score").desc, col("id").asc)
    val got = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
    val physical = got.queryExecution.executedPlan.toString
    assert(physical.contains("FinalTopK"), physical)
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rows.length === 3, rows.mkString(","))
    val ref = (1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toDouble))
    val expected = ref.sortBy { case (id, s) => (-s, id) }.take(3)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
    assert(rows.sortBy(_._3).toSeq === expected.toSeq)
  }

  test("rank/dense_rank and unbounded filters are NOT rewritten") {
    TopKPerKey.ensureRegistered(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
    val ranked = Tables.events(spark, sf()).select("user_id", "value")
      .withColumn("r", rank().over(w)).where(col("r") <= 2)
    assert(!ranked.queryExecution.executedPlan.toString.contains("FinalTopK"))
    val lower = Tables.events(spark, sf()).select("user_id", "event_id", "value")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
      .where(col("rn") >= 5) // lower bound: not a top-k
    assert(!lower.queryExecution.executedPlan.toString.contains("FinalTopK"))
  }

  test("extra filter conjuncts survive above the rewritten node") {
    TopKPerKey.ensureRegistered(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val df = Tables.events(spark, sf()).select("user_id", "event_id", "value")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5 && col("value") > 100.0)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("FinalTopK"), physical)
    assert(df.collect().forall(_.getDouble(2) > 100.0))
  }
}
