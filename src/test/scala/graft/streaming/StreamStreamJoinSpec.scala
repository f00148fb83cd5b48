package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-stream interval join with watermarks on both sides — beyond
  * the reference's streaming surface (SURVEY.md §2.9 T11 notes its
  * absence), included for engine completeness. The time-bound condition
  * is what lets Spark expire join state: each side buffers only rows
  * younger than watermark + interval.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  case class View(user: Long, vts: Timestamp)
  case class Buy(user: Long, bts: Timestamp, amount: Double)

  private def t(s: String) = Timestamp.valueOf(s)

  test("purchases join views of the same user within 60s, state bounded by watermark") {
    implicit val sc = spark.sqlContext
    val views = MemoryStream[View]
    val buys = MemoryStream[Buy]
    val v = views.toDF().withColumnRenamed("user", "vuser")
      .withWatermark("vts", "10 seconds")
    val b = buys.toDF().withWatermark("bts", "10 seconds")
    val joined = v.join(b,
      expr("""vuser = user AND bts >= vts AND bts <= vts + interval 60 seconds"""))
    val q = joined.select(col("user"), col("vts"), col("bts"), col("amount"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_join").start()
    try {
      views.addData(View(1, t("2024-01-01 00:00:00")), View(2, t("2024-01-01 00:00:05")))
      buys.addData(
        Buy(1, t("2024-01-01 00:00:30"), 10.0),  // within 60s of view -> match
        Buy(2, t("2024-01-01 00:02:00"), 20.0))  // 115s after view -> no match
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(3))).toSet === Set((1L, 10.0)))
    } finally q.stop()
  }
}
