package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe (not part of the driver contract): events ×32,
  * heavier operators timed to confirm near-linear scaling.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKPerKey.ensureRegistered(spark)
    val sf = "/root/testdata/sf0.1"
    val mult = 32
    val e0 = graft.model.Tables.events(spark, sf)
    // replicate with disjoint user/event ids so key cardinality scales too
    val big = e0.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("event_id") + col("rep") * 10000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    big.write.mode("overwrite").parquet("/tmp/events_x32.parquet")
    val ev = spark.read.parquet("/tmp/events_x32.parquet")
    println(s"rows=${ev.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("fraud_window_sum") {
      ev.groupBy(col("user_id"), window(col("ts"), "10 seconds"))
        .agg(round(sum("value"), 2).as("v")).where(col("v") > 150).count()
    }
    time("topk_rewrite_rownum") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      ev.select("user_id", "event_id", "value")
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 3).count()
    }
    time("window_sliding_sum") {
      ev.groupBy(col("user_id"), window(col("ts"), "30 seconds", "10 seconds"))
        .agg(round(sum("value"), 2).as("v")).where(col("v") > 150).count()
    }
    time("stateful_spend_batch") {
      graft.streaming.StatefulSpend.batchSpendAlerts(ev, 200.0).count()
    }
    time("range_join_10m") {
      val base = ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val iv = base.select(col("event_id"), col("user_id").as("ikey"),
        col("ts_us").as("start_us"), (col("ts_us") + 600000000L).as("end_us"))
      val pt = base.select(col("user_id").as("pkey"), col("ts_us"))
      graft.plans.RangeJoin.intervalPointJoin(iv, pt, "ikey", "pkey",
        "start_us", "end_us", "ts_us", 600000000L)
        .groupBy("event_id").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
