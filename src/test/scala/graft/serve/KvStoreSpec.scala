package graft.serve

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class KvStoreSpec extends SparkSpec {
  import spark.implicits._

  case class Alert(card: String, txn: String, ts: Timestamp, valor: Double)

  private def t(s: String) = Timestamp.valueOf(s)

  test("foreachBatch consumer upserts into the KV store; reprocessing overwrites") {
    implicit val sc = spark.sqlContext
    val store = new Serving.KvStore
    val stream = MemoryStream[Alert]
    val q = Serving.withTtl(stream.toDF(), "ts")
      .writeStream
      .foreachBatch(Serving.upsertBatch(store, "card", "txn") _)
      .start()
    try {
      stream.addData(
        Alert("c1", "t1", t("2024-01-01 00:00:01"), 6000.0),
        Alert("c1", "t2", t("2024-01-01 00:00:02"), 7000.0),
        Alert("c2", "t3", t("2024-01-01 00:00:03"), 8000.0))
      q.processAllAvailable()
      assert(store.size === 3)
      // same (pk, sk) again with a new value: upsert, not duplicate
      stream.addData(Alert("c1", "t1", t("2024-01-01 00:00:09"), 9999.0))
      q.processAllAvailable()
      assert(store.size === 3)
      val c1 = store.query("c1")
      assert(c1.map(_._1) === Seq("t1", "t2"), "sort-key order")
      assert(c1.head._2("valor") === "9999.0")
      // TTL column stamped (event epoch + 30d)
      val ttl = c1.head._2("ttl").toLong
      assert(ttl === t("2024-01-01 00:00:09").getTime / 1000 + Serving.TtlSeconds)
    } finally q.stop()
  }
}
