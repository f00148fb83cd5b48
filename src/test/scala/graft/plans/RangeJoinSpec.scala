package graft.plans

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("intervalPointJoin matches (start, end] semantics across bucket boundaries") {
    // bucket width 10: interval (5, 25] spans buckets 0,1,2
    val intervals = Seq((1L, "iv1", 5L, 25L), (2L, "iv2", 0L, 4L))
      .toDF("ikey", "iname", "start_ts", "end_ts")
    val points = Seq(
      (1L, 5L),   // == start: excluded (strict >)
      (1L, 6L),   // in, bucket 0
      (1L, 15L),  // in, bucket 1
      (1L, 25L),  // == end: included, bucket 2
      (1L, 26L),  // out
      (2L, 3L),   // other key, in
      (3L, 10L)   // no key match
    ).toDF("pkey", "ts")
    val out = RangeJoin.intervalPointJoin(intervals, points,
      "ikey", "pkey", "start_ts", "end_ts", "ts", 10L)
      .select("iname", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(out === Seq(("iv1", 6L), ("iv1", 15L), ("iv1", 25L), ("iv2", 3L)))
  }

  test("each matching pair appears exactly once (no bucket-overlap dupes)") {
    val intervals = Seq((1L, 0L, 100L)).toDF("ikey", "start_ts", "end_ts")
    val points = (1L to 100L).map(t => (1L, t)).toDF("pkey", "ts")
    val out = RangeJoin.intervalPointJoin(intervals, points,
      "ikey", "pkey", "start_ts", "end_ts", "ts", 10L)
    assert(out.count() === 100)
    assert(out.select("ts").distinct().count() === 100)
  }
}
