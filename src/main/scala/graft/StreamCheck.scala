package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-runnable streaming evidence (sbt-free): runs the Structured
  * Streaming fraud plan (§2.9 T1-T5) over a harness dir with
  * `Trigger.AvailableNow`, checks stream == batch parity against the
  * batch twin of the same plan, reruns on the same checkpoint to prove
  * the bookmark semantics (T7/T10: second pass processes nothing), and
  * prints ONE JSON line.
  *
  * Usage: `runMain graft.StreamCheck [sfDir]` (default sf0.01).
  */
object StreamCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-streamcheck").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val windowSec = graft.queries.ReferenceQueries.WindowSec
    val threshold = graft.queries.ReferenceQueries.Threshold
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sc_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sc_out").toString
    val processed = new java.util.concurrent.atomic.AtomicLong

    // memory sink can't recover a checkpoint, so results land in parquet
    // via foreachBatch (b.count() also forces every partition so the
    // state store commit validates)
    def runOnce(): Unit = {
      val raw = spark.readStream
        .schema(graft.streaming.StreamingFraud.eventsRawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val q = graft.streaming.StreamingFraud
        .fraudStream(raw, windowSec, threshold)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          processed.addAndGet(b.count())
          b.write.mode("append").parquet(outDir)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val t0 = System.nanoTime()
    runOnce()
    val firstPass = processed.get()
    val stream = spark.read.parquet(outDir)
    val batch = graft.stream.Fraud.windowSum(
      graft.model.Tables.events(spark, sfDir), windowSec, threshold)
    val streamRows = stream.count()
    val missing = batch.exceptAll(stream).count() // in batch, not stream
    val extra = stream.exceptAll(batch).count()   // in stream, not batch
    runOnce() // bookmark rerun: same checkpoint, no new files
    val rerunProcessed = processed.get() - firstPass
    val sec = (System.nanoTime() - t0) / 1e9
    val parity = streamRows > 0 && missing == 0 && extra == 0
    println(
      s"""{"check":"streaming_fraud","sf":"$sfDir","rows":$streamRows,""" +
      s""""parity":$parity,"missing_vs_batch":$missing,"extra_vs_batch":$extra,""" +
      s""""rerun_processed":$rerunProcessed,"bookmark_ok":${rerunProcessed == 0L},""" +
      s""""sec":${math.rint(sec * 1000) / 1000}}""")
    spark.stop()
    if (!parity || rerunProcessed != 0L) sys.exit(1)
  }
}
