package graft.etl

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge: source updates matched keys, inserts new ones, passes through the rest") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val source = Seq((2L, "b2", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val out = Upsert.merge(target, source, "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set(
      (1L, "a", 10.0),   // untouched
      (2L, "b2", 99.0),  // updated
      (3L, "c", 30.0),   // untouched
      (4L, "d", 40.0)))  // inserted
  }

  test("merge: target-only columns kept (null for inserts), source-only appended") {
    val target = Seq((1L, "a", "X")).toDF("k", "name", "extra_t")
    val source = Seq((1L, "a2", 7L), (2L, "b", 8L)).toDF("k", "name", "extra_s")
    val out = Upsert.merge(target, source, "k")
    assert(out.columns.toSeq === Seq("k", "name", "extra_t", "extra_s"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), Option(r.getString(2)), r.getLong(3))).toMap
    assert(rows(1L) === (("a2", Some("X"), 7L)))
    assert(rows(2L) === (("b", None, 8L)))
  }

  test("merge: duplicate source keys fail (SQL MERGE multiple-match semantics)") {
    val target = Seq((1L, "a")).toDF("k", "name")
    val dup = Seq((1L, "x"), (1L, "y")).toDF("k", "name")
    val e = intercept[Exception] {
      Upsert.merge(target, dup, "k").collect()
    }
    assert(e.getMessage.contains("duplicate source key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate source key")),
      s"unexpected error: ${e.getMessage}")
  }

  test("merge: latestBy keeps the max-version source row per key") {
    val target = Seq((1L, "a", 0L)).toDF("k", "name", "ver")
    val src = Seq((1L, "v1", 1L), (1L, "v3", 3L), (1L, "v2", 2L),
      (2L, "new", 9L)).toDF("k", "name", "ver")
    val out = Upsert.merge(target, src, "k", latestBy = Some("ver")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out === Map(1L -> (("v3", 3L)), 2L -> (("new", 9L))))
  }
}
