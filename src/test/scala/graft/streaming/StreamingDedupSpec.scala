package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming exact-dedup — the streaming form of `graft.dedup`'s batch
  * operators. `dropDuplicatesWithinWatermark` keys the state store by
  * the dedup column and expires entries once the watermark passes, so
  * state is bounded by the dedup horizon instead of growing forever —
  * the property that makes streaming dedup viable on an unbounded
  * 100 TB/day feed.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(fp: String, ts: Timestamp, payload: String)

  private def t(s: String) = Timestamp.valueOf(s)

  test("duplicate fingerprints within the watermark horizon are dropped") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    try {
      stream.addData(
        Doc("a", t("2024-01-01 00:00:01"), "first-a"),
        Doc("b", t("2024-01-01 00:00:02"), "first-b"),
        Doc("a", t("2024-01-01 00:00:03"), "dup-a-same-batch"))
      q.processAllAvailable()
      stream.addData(
        Doc("a", t("2024-01-01 00:01:00"), "dup-a-next-batch"),
        Doc("c", t("2024-01-01 00:01:30"), "first-c"))
      q.processAllAvailable()
      val out = spark.table("stream_dedup").collect()
        .map(r => (r.getString(0), r.getString(2))).toMap
      assert(out === Map("a" -> "first-a", "b" -> "first-b", "c" -> "first-c"))
    } finally q.stop()
  }
}
