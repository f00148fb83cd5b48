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

  test("partition-parallel upsert == driver-collect upsert, including " +
    "reprocessing overwrites") {
    implicit val sc = spark.sqlContext
    val collectStore = new Serving.KvStore
    val partStore = new Serving.KvStore
    val clientId = Serving.KvClients.register(partStore)
    val s1 = MemoryStream[Alert]
    val s2 = MemoryStream[Alert]
    val q1 = Serving.withTtl(s1.toDF(), "ts").writeStream
      .foreachBatch(Serving.upsertBatch(collectStore, "card", "txn") _).start()
    val q2 = Serving.withTtl(s2.toDF(), "ts")
      .repartition(8) // force multi-partition executor-side writes
      .writeStream
      .foreachBatch(Serving.upsertPartitions(clientId, "card", "txn") _).start()
    try {
      val batch1 = Seq(
        Alert("c1", "t1", t("2024-01-01 00:00:01"), 6000.0),
        Alert("c1", "t2", t("2024-01-01 00:00:02"), 7000.0),
        Alert("c2", "t3", t("2024-01-01 00:00:03"), 8000.0),
        Alert("c3", "t4", t("2024-01-01 00:00:04"), 8500.0))
      // reprocessed key: both paths must overwrite, never duplicate
      val batch2 = Seq(Alert("c1", "t1", t("2024-01-01 00:00:09"), 9999.0))
      s1.addData(batch1); q1.processAllAvailable()
      s2.addData(batch1); q2.processAllAvailable()
      s1.addData(batch2); q1.processAllAvailable()
      s2.addData(batch2); q2.processAllAvailable()
      assert(partStore.size === 4)
      assert(partStore.entries === collectStore.entries,
        "both sink paths must produce identical store contents")
    } finally { q1.stop(); q2.stop(); Serving.KvClients.unregister(clientId) }
  }
}
