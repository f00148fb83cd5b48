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

  // two disjoint event files for the T6/T9 tests: users 1-3 in fileA,
  // users 11-13 in fileB (raw schema: ts as long NANOS, like the harness)
  private def writeEventsFile(dir: String, name: String, users: Seq[Long]): Unit = {
    // windows 1000 s apart per user so the final watermark (max ts − 10 s)
    // passes every window but the newest user's — append mode then emits
    // all the rest
    val rows = users.flatMap(u => Seq(
      (u * 100 + 1, 1704067200000000000L + u * 1000L * 1000000000L, u, "purchase", 180.0, "{}"),
      (u * 100 + 2, 1704067201000000000L + u * 1000L * 1000000000L, u, "purchase", 60.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(s"$dir/__stage_$name")
    // move the part file in as a stable name so arrival order is explicit
    val src = new java.io.File(s"$dir/__stage_$name").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    src.renameTo(new java.io.File(s"$dir/$name.parquet"))
    new scala.reflect.io.Directory(new java.io.File(s"$dir/__stage_$name"))
      .deleteRecursively()
  }

  test("ProcessingTime trigger paces bounded micro-batches (T9 Firehose buffering)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t9").toString
    writeEventsFile(dir, "a", Seq(1L, 2L, 3L))
    writeEventsFile(dir, "b", Seq(11L, 12L, 13L))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_t9_ckpt").toString
    val q = StreamingFraud.runFileStreamMicroBatch(spark, dir, "fraud_t9",
      10, 150.0, ckpt, intervalMs = 100L, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    // maxFilesPerTrigger=1 over 2 files ⇒ at least 2 non-empty batches
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2, s"expected ≥2 paced micro-batches, got $batches")
    // each (user, window) sums 240 > 150 ⇒ one row per user, all 6 users
    // except tail windows unreached by the final watermark; require ≥4
    val users = spark.table("fraud_t9").select("user_id")
      .collect().map(_.getLong(0)).toSet
    assert(users.size >= 4, s"got $users")
  }

  test("start position: LATEST skips the backlog, TRIM_HORIZON replays it (T6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t6").toString
    writeEventsFile(dir, "backlog", Seq(1L, 2L, 3L))
    // LATEST: prime the checkpoint while only the backlog exists
    val ckptLatest = java.nio.file.Files.createTempDirectory("graft_t6_latest").toString
    StreamingFraud.primeCheckpointAtLatest(spark, dir, ckptLatest, 10, 150.0)
    // new data arrives after the LATEST position was taken
    writeEventsFile(dir, "fresh", Seq(11L, 12L, 13L))
    // memory sink can't recover a checkpoint — collect via foreachBatch
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val raw = StreamingFraud.eventsStream(spark, dir, "*.parquet")
    val q1 = StreamingFraud.fraudStream(raw, 10, 150.0)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptLatest)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        b.select("user_id").collect().foreach(r => seen.add(r.getLong(0))); ()
      })
      .start()
    try q1.processAllAvailable() finally q1.stop()
    import scala.jdk.CollectionConverters._
    val latestUsers = seen.asScala.toSet
    // users 1,2's windows closed (emitted + discarded) during priming;
    // user 3's window was still open at the position, so it may emit on
    // the first post-position watermark advance — never users 1,2
    assert(latestUsers.intersect(Set(1L, 2L)).isEmpty,
      s"LATEST must not re-emit pre-position results, got $latestUsers")
    assert(Set(11L, 12L).subsetOf(latestUsers),
      s"LATEST must emit post-position results, got $latestUsers")
    // TRIM_HORIZON: fresh checkpoint replays everything
    val ckptTrim = java.nio.file.Files.createTempDirectory("graft_t6_trim").toString
    val q2 = StreamingFraud.runFileStreamMicroBatch(spark, dir, "fraud_t6_trim",
      10, 150.0, ckptTrim, intervalMs = 100L, maxFilesPerTrigger = 10)
    try q2.processAllAvailable() finally q2.stop()
    val trimUsers = spark.table("fraud_t6_trim").select("user_id")
      .collect().map(_.getLong(0)).toSet
    assert(trimUsers.exists(_ <= 3L) && trimUsers.exists(_ >= 11L),
      s"TRIM_HORIZON must replay backlog + fresh, got $trimUsers")
  }

  // raw-schema writer with explicit rows, for state-continuity fixtures
  private def writeRawEvents(dir: String, name: String,
                             rows: Seq[(Long, Long, Long, Double)]): Unit = {
    rows.map { case (id, tsNanos, u, v) => (id, tsNanos, u, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(s"$dir/__stage_$name")
    val src = new java.io.File(s"$dir/__stage_$name").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    src.renameTo(new java.io.File(s"$dir/$name.parquet"))
    new scala.reflect.io.Directory(new java.io.File(s"$dir/__stage_$name"))
      .deleteRecursively()
  }

  test("stop after batch N + restart from checkpoint = uninterrupted final " +
    "state, incl. window state SPANNING the stop (T7 crash recovery)") {
    import org.apache.spark.sql.streaming.Trigger
    val base = 1704067200000000000L // 2024-01-01 in nanos
    def sec(s: Long) = base + s * 1000000000L
    // user 7's [0,10) window gets 100.0 before the stop and 100.0 after;
    // EACH HALF is below the 150 threshold — the correct (7, 200.0)
    // emission after restart is only possible if the restarted query
    // recovered the partial sum AND the watermark from the checkpoint
    val fileA = Seq((1L, sec(0), 7L, 100.0), (2L, sec(5), 8L, 60.0))
    val fileC = Seq((3L, sec(3), 7L, 100.0), (4L, sec(2000), 9L, 200.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_t7").toString
    writeRawEvents(dir, "a", fileA)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_t7_ckpt").toString
    val seen = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long, Double)]()
    def start(trigger: Trigger) = {
      val raw = StreamingFraud.eventsStream(spark, dir, "*.parquet")
      StreamingFraud.fraudStream(raw, 10, 150.0)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.collect().foreach(r => seen.add(
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))); ()
        })
        .trigger(trigger).start()
    }
    // run 1: process file a, then STOP — watermark is sec(-5), so
    // user 7's window is still open: all its state lives in the store
    val q1 = start(Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(seen.isEmpty, s"nothing should emit before the stop, got $seen")
    // data arrives while the query is down
    writeRawEvents(dir, "c", fileC)
    // run 2: restart from the SAME checkpoint and drain
    val q2 = start(Trigger.AvailableNow())
    q2.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val resumed = seen.asScala.toSet
    assert(resumed.exists { case (u, ws, _, v) =>
      u == 7L && ws == sec(0) / 1000000000L && v == 200.0 },
      s"restored state must complete user 7's cross-stop window: $resumed")
    // restart resumed from the bookmark: only file c's rows were read
    assert(q2.recentProgress.map(_.numInputRows).sum == fileC.size,
      q2.recentProgress.map(_.numInputRows).mkString(","))
    // reference: uninterrupted run over the same data, fresh checkpoint
    val ckptRef = java.nio.file.Files.createTempDirectory("graft_t7_ref").toString
    val seenRef = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long, Double)]()
    val raw = StreamingFraud.eventsStream(spark, dir, "*.parquet")
    val qRef = StreamingFraud.fraudStream(raw, 10, 150.0)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptRef)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        b.collect().foreach(r => seenRef.add(
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))); ()
      })
      .trigger(Trigger.AvailableNow()).start()
    qRef.awaitTermination(120000)
    assert(resumed == seenRef.asScala.toSet,
      s"stop+resume must equal the uninterrupted run: $resumed vs $seenRef")
  }

  test("AvailableNow rerun on the same checkpoint processes nothing (bookmark, T10)") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val counter = new java.util.concurrent.atomic.AtomicLong
    def runOnce(): Unit = {
      val raw = StreamingFraud.eventsStream(spark, sf(), "events.parquet")
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
