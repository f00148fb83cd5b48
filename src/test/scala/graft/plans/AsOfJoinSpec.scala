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

  test("asofJoin with nullable payload: fields never mix across right rows") {
    // right rows with nulls in different payload columns: a per-column
    // carry would combine px from one row with qty from another, and an
    // all-null matched row would be dropped or replaced by a stale one
    val quotes = Seq(
      (1L, t("2024-01-01 00:00:01"), Option(100.0), Option(5L)),
      (1L, t("2024-01-01 00:00:02"), None, Option(7L)),
      (1L, t("2024-01-01 00:00:03"), Option(300.0), None),
      (1L, t("2024-01-01 00:00:04"), None, None)
    ).toDF("k", "ts", "px", "qty")
    val trades = Seq(
      (10L, 1L, t("2024-01-01 00:00:02")),
      (11L, 1L, t("2024-01-01 00:00:03")),
      (12L, 1L, t("2024-01-01 00:00:05"))
    ).toDF("tid", "tk", "tts")
    val out = AsOfJoin.asofJoin(trades, quotes, "tk", "k", "tts", "ts",
      Seq("px", "qty")).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(out(10L) === ((None, Some(7L))),      "must take BOTH fields from the 00:02 row")
    assert(out(11L) === ((Some(300.0), None)),   "must take BOTH fields from the 00:03 row")
    assert(out(12L) === ((None, None)),          "all-null matched row must survive as the match")
  }

  test("asofJoin output keeps left columns and appends payload") {
    val l = Seq((1L, t("2024-01-01 00:00:02"), "a")).toDF("k", "ts", "tag")
    val r = Seq((1L, t("2024-01-01 00:00:01"), 7L)).toDF("k2", "ts2", "v")
    val out = AsOfJoin.asofJoin(l, r, "k", "k2", "ts", "ts2", Seq("v"))
    assert(out.columns.toSeq === Seq("k", "ts", "tag", "v"))
    assert(out.collect().head.getLong(3) === 7L)
  }
}
