package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables
import graft.stream.Fraud

case class Ev(user_id: Long, ts: Timestamp, value: Double)

class StreamingFraudSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming windowed sum matches the batch plan on the same data (T1-T3)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    val rows = Seq(
      Ev(1, t("2024-01-01 00:00:01"), 100.0),
      Ev(1, t("2024-01-01 00:00:05"), 120.0), // same 10s window: sum 220
      Ev(2, t("2024-01-01 00:00:03"), 50.0),  // below threshold
      Ev(1, t("2024-01-01 00:01:00"), 160.0)) // separate window
    stream.addData(rows: _*)
    // advance the watermark past all windows so append mode emits them
    stream.addData(Ev(99, t("2024-01-01 01:00:00"), 0.0))

    val q = StreamingFraud.fraudStream(stream.toDF(), 10, 150.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("fraud_stream_test").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("fraud_stream_test")
      .select("user_id", "window_start", "window_end", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Fraud.windowSum(
      rows.toDF().union(Seq(Ev(99, t("2024-01-01 01:00:00"), 0.0)).toDF()), 10, 150.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (u, _, _, v) => u == 1 && v == 220.0 })
  }

  test("late data past the watermark is dropped in append mode (T2/T4/T5)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamingFraud.fraudStream(stream.toDF(), 10, 150.0, "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("fraud_late_test").start()
    try {
      stream.addData(Ev(1, t("2024-01-01 00:00:01"), 200.0))
      q.processAllAvailable()
      // push the watermark far past the first window
      stream.addData(Ev(2, t("2024-01-01 00:10:00"), 200.0))
      q.processAllAvailable()
      // late arrival into the long-closed first window: must be ignored
      stream.addData(Ev(1, t("2024-01-01 00:00:05"), 500.0))
      q.processAllAvailable()
      stream.addData(Ev(3, t("2024-01-01 00:20:00"), 200.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("fraud_late_test")
      .select("user_id", "total_value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // user 1's first window emitted 200.0 (not 700.0 — the late 500 dropped)
    assert(out.count(_._1 == 1L) == 1)
    assert(out.contains((1L, 200.0)))
  }

  test("Trigger.AvailableNow file stream reproduces the batch result (T10)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = StreamingFraud.runFileStreamOnce(spark, sf(), "fraud_file_stream",
      10, 150.0, ckpt)
    q.awaitTermination(120000)
    val streamed = spark.table("fraud_file_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Fraud.windowSum(Tables.events(spark, sf()), 10, 150.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // append mode only emits windows the final watermark passed; with a
    // single batch the last max-event-time sets the watermark, so all but
    // the tail windows emit. The streamed set must be a subset equal to
    // batch minus the tail.
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size - 2, s"${streamed.size} vs ${batch.size}")

  }

  test("AvailableNow rerun on the same checkpoint processes nothing (bookmark, T10)") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val counter = new java.util.concurrent.atomic.AtomicLong
    def runOnce(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.readStream
        .schema(StreamingFraud.eventsRawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf())
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      val q = StreamingFraud.fraudStream(raw, 10, 150.0)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          { counter.addAndGet(b.count()); () })
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val afterFirst = counter.get()
    assert(afterFirst > 0, "first run must emit rows")
    runOnce()
    assert(counter.get() === afterFirst,
      "second AvailableNow run with the same checkpoint must process nothing")
  }
}
