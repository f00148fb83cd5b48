package graft.plans

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the greatest right ts <= left ts per key") {
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100.0),
      (1L, t("2024-01-01 10:00:05"), 101.0),
      (1L, t("2024-01-01 10:00:10"), 102.0),
      (2L, t("2024-01-01 10:00:07"), 200.0)
    ).toDF("qkey", "qts", "price")
    val trades = Seq(
      (10L, 1L, t("2024-01-01 10:00:03")),  // -> 100.0
      (11L, 1L, t("2024-01-01 10:00:05")),  // inclusive -> 101.0
      (12L, 1L, t("2024-01-01 10:00:30")),  // -> 102.0
      (13L, 2L, t("2024-01-01 10:00:06")),  // before any quote -> dropped
      (14L, 3L, t("2024-01-01 10:00:06"))   // no key match -> dropped
    ).toDF("trade_id", "tkey", "tts")

    val out = AsOfJoin.asofJoin(trades, quotes, "tkey", "qkey",
      "tts", "qts", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(10L -> 100.0, 11L -> 101.0, 12L -> 102.0))
  }

  test("asofJoin output keeps left columns and appends payload") {
    val l = Seq((1L, t("2024-01-01 00:00:02"), "a")).toDF("k", "ts", "tag")
    val r = Seq((1L, t("2024-01-01 00:00:01"), 7L)).toDF("k2", "ts2", "v")
    val out = AsOfJoin.asofJoin(l, r, "k", "k2", "ts", "ts2", Seq("v"))
    assert(out.columns.toSeq === Seq("k", "ts", "tag", "v"))
    assert(out.collect().head.getLong(3) === 7L)
  }
}
