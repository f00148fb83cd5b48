package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.model.Tables

class StatefulSpendSpec extends SparkSpec {
  import spark.implicits._
  import StatefulSpend._

  private def batchAlerts(): Set[(Long, Long, Double)] =
    batchSpendAlerts(Tables.events(spark, sf()), 200.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streaming flatMapGroupsWithState == batch window twin on ordered replay") {
    val txns = asTxns(Tables.events(spark, sf())).collect()
      .sortBy(t => (t.tsMicros, t.event_id))
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Txn]
    val out = streamingSpendAlerts(stream.toDS(), 200.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("spend_alerts").start()
    try {
      // two batches: state must carry running totals across the boundary
      val (first, second) = txns.splitAt(txns.length / 2)
      stream.addData(first.toSeq)
      out.processAllAvailable()
      stream.addData(second.toSeq)
      out.processAllAvailable()
      val got = spark.table("spend_alerts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === batchAlerts())
    } finally out.stop()
  }

  test("at most one alert per user; alert totals are >= threshold") {
    val alerts = batchSpendAlerts(Tables.events(spark, sf()), 200.0).collect()
    val perUser = alerts.groupBy(_.getLong(0))
    // events.value >= 0 in the harness data → running sum is monotone →
    // exactly one upward crossing per user that ever reaches 200
    assert(perUser.values.forall(_.length == 1))
    assert(alerts.forall(_.getDouble(2) >= 200.0))
  }
}
