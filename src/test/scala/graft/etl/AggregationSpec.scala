package graft.etl

import graft.SparkSpec
import graft.etl.Aggregation._

class AggregationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0, 10L), ("a", 2.0, 20L), ("b", 3.0, 30L)
  ).toDF("k", "v", "w")

  test("grouped aggregation with whitelisted functions") {
    val out = sparkAggregate(df, Seq("k"), Seq(
      AggSpec("v", "sum"), AggSpec("w", "max"), AggSpec("v", "count")))
      .orderBy("k").collect()
    assert(out(0).getString(0) == "a" && out(0).getDouble(1) == 3.0
      && out(0).getLong(2) == 20L && out(0).getLong(3) == 2L)
    assert(out(1).getDouble(1) == 3.0 && out(1).getLong(2) == 30L)
  }

  test("empty groups falls back to global aggregation (spec.py:17-21)") {
    val out = sparkAggregate(df, Seq.empty, Seq(AggSpec("v", "sum", Some("total"))))
    assert(out.columns.toSeq == Seq("total"))
    assert(out.head().getDouble(0) == 6.0)
  }

  test("unknown names dispatch through expr — SQL aggregates resolve") {
    val out = sparkAggregate(df, Seq("k"), Seq(AggSpec("v", "median")))
    assert(out.where($"k" === "a").head().getDouble(1) == 1.5)
  }

  test("genuinely unknown function fails at analysis, like getattr would") {
    assertThrows[Exception] {
      sparkAggregate(df, Seq("k"), Seq(AggSpec("v", "no_such_fn_xyz"))).collect()
    }
  }

  test("default output naming is func_column") {
    val out = sparkAggregate(df, Seq("k"), Seq(AggSpec("v", "avg")))
    assert(out.columns.contains("avg_v"))
  }

  test("incremental rollup merge (state + batch re-agg) is bit-equal to " +
    "the from-scratch rollup — the mergeable-representation invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val o = graft.model.Tables.orders(spark, sf()).select(
      col("o_orderkey"), col("o_orderpriority"),
      year(col("o_orderdate")).cast("int").as("o_year"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"), col("o_year"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val merged = rollup(o.where(col("o_orderkey") % 10 =!= 7))
      .unionByName(rollup(o.where(col("o_orderkey") % 10 === 7)))
      .groupBy(col("o_orderpriority"), col("o_year"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
    val full = rollup(o)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("funnelStages walks the hand-built chains (order, window, breaks)") {
    import org.apache.spark.sql.functions.col
    def ev(u: Long, t: String, sec: Long) = (u, t, sec)
    val rows = Seq(
      // user 1: clean chain → stage 3
      ev(1, "view", 100), ev(1, "click", 200), ev(1, "purchase", 300),
      // user 2: click only BEFORE the first view; purchase before any
      // valid click → chain breaks at stage 1
      ev(2, "click", 50), ev(2, "view", 100), ev(2, "purchase", 90),
      // user 3: purchase earlier than the chosen click → stage 2
      ev(3, "view", 100), ev(3, "click", 200), ev(3, "purchase", 150),
      // user 4: click outside the 3600 s window of the first view
      ev(4, "view", 100), ev(4, "click", 100 + 3601),
      // user 5: no view at all → stage 0
      ev(5, "click", 100),
      // users 6/7: purchase just inside vs just outside the window
      ev(6, "view", 0), ev(6, "click", 10), ev(6, "purchase", 3599),
      ev(7, "view", 0), ev(7, "click", 10), ev(7, "purchase", 3700))
      .toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        col("sec").cast("timestamp").as("ts"))
    val out = Aggregation.funnelStages(rows, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSec = 3600L)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0,
      6L -> 3, 7L -> 2))
  }

  test("madOutliers: modified z-score flags the spike; MAD=0 group " +
    "yields no outliers and null max_z") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), ("b", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("event_type", "value")
    val out = Aggregation.madOutliers(rows, "event_type", "value")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    // a: med 3, MAD 1; z(100) = 0.6745·97 = 65.4265 — the only z > 3.5
    assert(out("a") == ((5L, 3.0, 1.0, 1L, Some(65.4265))))
    // b: med 5, MAD 0 → no z-scores at all
    assert(out("b") == ((3L, 5.0, 0.0, 0L, None)))
  }

  test("cohortRetention counts distinct actives per (cohort, offset)") {
    import org.apache.spark.sql.functions.col
    val day = 86400L
    // u1 joins day 0 (twice that day — distinct), active days 1 and 5;
    // u2 joins day 0, active day 1; u3 joins day 1 only
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, day + 5), (1L, 5 * day + 5),
      (2L, 30L), (2L, day + 9),
      (3L, day + 2))
      .toDF("user_id", "sec")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"))
    val out = Aggregation.cohortRetention(rows, "user_id", "ts").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map((0, 0) -> 2L, (0, 1) -> 2L, (0, 5) -> 1L,
      (1, 0) -> 1L))
  }

  test("weightedMedian: lower weighted median with ties and a " +
    "heavy-tail group") {
    val rows = Seq(
      // a: cum weights 1,3,13 of 13 → first 2·cw ≥ 13 at value 3.0
      ("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 10L),
      // b: tied values share one RANGE-frame cum weight: cw(1.0)=4 of
      // 6 → 2·4 ≥ 6 already at 1.0 regardless of row order
      ("b", 1.0, 2L), ("b", 1.0, 2L), ("b", 9.0, 2L),
      // c: single row is its own median
      ("c", 7.5, 3L))
      .toDF("k", "v", "w")
    val out = Aggregation.weightedMedian(rows, "k", "v", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map("a" -> ((13L, 3L, 3.0)), "b" -> ((6L, 3L, 1.0)),
      "c" -> ((3L, 1L, 7.5))))
  }

  test("winsorizedAgg: clip counts and integer-cents mean, " +
    "hand-computed at p25/p75") {
    // values 1..4 + spike 100: p25 = 2 (interpolated), p75 = 4 exactly?
    // quantile_cont over [1,2,3,4,100]: p25 = 2.0, p75 = 4.0 → clips:
    // 1→2 (lo), 100→4 (hi); clipped = 2,2,3,4,4 → mean 300 cents
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0)).toDF("k", "v")
    val r = Aggregation.winsorizedAgg(rows, "k", "v", 0.25, 0.75)
      .collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((5L, 2.0, 4.0, 1L, 1L, 300L)))
  }

  test("rfmScores: best-on-axis gets 5, ties break on key") {
    import org.apache.spark.sql.functions.col
    val day = 86400L
    // u1: recent + frequent + big; u2: old + rare + small
    val rows = Seq(
      (1L, 9 * day, 10.0), (1L, 9 * day + 5, 10.0),
      (2L, 0L, 1.0))
      .toDF("user_id", "sec", "value")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
        col("value"))
    val out = Aggregation.rfmScores(rows, "user_id", "ts", "value",
        buckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getInt(5), r.getInt(6)))).toMap
    assert(out(1L) == ((0, 2L, 2000L, 2, 2, 2)))
    assert(out(2L) == ((9, 1L, 100L, 1, 1, 1)))
  }

  test("rfmScores: distributed-rank path == single-partition ntile " +
    "path on real events, including ntile's remainder buckets") {
    val ev = graft.model.Tables.events(spark, sf())
      .select("user_id", "ts", "value")
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getInt(5), r.getInt(6)))).toMap
    // buckets=7 so n % buckets is almost surely nonzero — the
    // remainder arithmetic (first r buckets take q+1 rows) is on trial
    val viaWindow = collectMap(
      Aggregation.rfmScores(ev, "user_id", "ts", "value", buckets = 7))
    val viaRank = collectMap(
      Aggregation.rfmScores(ev, "user_id", "ts", "value", buckets = 7,
        maxSinglePartitionRows = 1)) // force the distributed plan
    assert(viaRank.size == viaWindow.size && viaRank.nonEmpty)
    viaWindow.foreach { case (k, v) =>
      assert(viaRank(k) == v, s"user $k: ${viaRank(k)} vs window $v")
    }
  }

  test("rfmScores: a NULL-key group is scored identically on both " +
    "paths (n counts the per-key frame, score joins are null-safe)") {
    import org.apache.spark.sql.functions.col
    val day = 86400L
    val rows = Seq(
      (Option(1L), 9 * day, 10.0), (Option(1L), 9 * day + 5, 10.0),
      (Option(2L), 0L, 1.0), (Option.empty[Long], 4 * day, 7.0),
      (Option(3L), 2 * day, 3.0), (Option(4L), 5 * day, 20.0))
      .toDF("user_id", "sec", "value")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
        col("value"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
          ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4),
            r.getInt(5), r.getInt(6)))).toMap
    val viaWindow = canon(
      Aggregation.rfmScores(rows, "user_id", "ts", "value", buckets = 3))
    val viaRank = canon(
      Aggregation.rfmScores(rows, "user_id", "ts", "value", buckets = 3,
        maxSinglePartitionRows = 1)) // force the distributed plan
    assert(viaWindow.contains(-1L),
      "the null-key group must be scored, not dropped")
    assert(viaRank == viaWindow,
      s"distributed $viaRank must equal window $viaWindow incl. null key")
  }

  test("sessionPaths: gap islands, path truncation, frequency rank") {
    import org.apache.spark.sql.functions.col
    // u1: events at 0,10,20 (one session: a>b>c), then 400 (new
    // session: a); u2: 0,5 (a>b), 1000,1005,1010,1015 (a>b>c truncated
    // at pathLen=3)
    val rows = Seq(
      (1L, 100L, "a", 0L), (1L, 101L, "b", 10L), (1L, 102L, "c", 20L),
      (1L, 103L, "a", 400L),
      (2L, 200L, "a", 0L), (2L, 201L, "b", 5L),
      (2L, 202L, "a", 1000L), (2L, 203L, "b", 1005L),
      (2L, 204L, "c", 1010L), (2L, 205L, "d", 1015L))
      .toDF("user_id", "event_id", "event_type", "sec")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("sec").cast("timestamp").as("ts"))
    val out = Aggregation.sessionPaths(rows, "user_id", "event_id",
        "event_type", "ts", gapSec = 60L, pathLen = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a>b>c", 2L, 1), ("a", 1L, 2), ("a>b", 1L, 3)))
  }

  test("timeDecayAgg: stepped half-life weights, hand-computed") {
    import org.apache.spark.sql.functions.col
    // halflife 10 s; newest row (t=100) is the reference: ages 0, 5,
    // 10, 25, 300 → k = 0,0,1,2,30 → weights 1e6, 1e6, 5e5, 25e4, 0
    val rows = Seq(("a", 100L, 1.0), ("a", 95L, 1.0), ("a", 90L, 1.0),
      ("a", 75L, 1.0), ("a", -200L, 1.0))
      .toDF("k", "sec", "v")
      .select(col("k"), col("sec").cast("timestamp").as("ts"), col("v"))
    val r = Aggregation.timeDecayAgg(rows, "k", "ts", "v", 10L)
      .collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 500L)
    // 100·(1e6 + 1e6 + 5e5 + 25e4 + 0)
    assert(r.getLong(3) == 100L * 2750000L)
  }

  test("weightedPercentiles: integer-threshold cuts, ends included") {
    // weights 1,2,10 of 13: cum 1,3,13 → p10: 100·1≥130? no; 100·3≥130
    // yes → 2.0; p25: 300≥325? no → 3.0; p75/p90 → 3.0; p100 = max
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 10L))
      .toDF("k", "v", "w")
    val out = Aggregation.weightedPercentiles(rows, "k", "v", "w",
        Seq(10, 25, 75, 100))
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).head
    assert(out == ((2.0, 3.0, 3.0, 3.0)))
  }
}
