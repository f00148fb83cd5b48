package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class SkewSpec extends SparkSpec {

  test("saltedEquiJoin is row-identical to the plain equi-join") {
    val e = Tables.events(spark, sf()).select("event_id", "user_id", "value")
    val c = Tables.customer(spark, sf()).select("c_custkey", "c_name")
    val salted = Skew.saltedEquiJoin(e, c, "user_id", "c_custkey", numSalts = 8)
      .select("event_id", "user_id", "c_custkey", "c_name")
    val plain = e.join(c, e("user_id") === c("c_custkey"))
      .select("event_id", "user_id", "c_custkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt spreads a hot key over multiple shuffle sub-keys") {
    import spark.implicits._
    // one key carries 1000 rows (hot), others 1 row each
    val hot = (1 to 1000).map(i => (42L, i.toDouble)) ++ Seq((1L, 1.0), (2L, 2.0))
    val large = hot.toDF("k", "v").repartition(8)
    val small = Seq((42L, "hot"), (1L, "a"), (2L, "b")).toDF("k2", "name")
    val out = Skew.saltedEquiJoin(large, small, "k", "k2", numSalts = 8)
    assert(out.count() === 1002)
    // the salted large side must actually use >1 distinct salt for the hot key
    val salts = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .where($"k" === 42L).select("__salt").distinct().count()
    assert(salts > 1)
  }

  test("skewProfile reports hand-computed hot keys and salt advice") {
    import spark.implicits._
    // key 1 ×6, key 2 ×2, keys 3,4 ×1 → total 10, 4 keys, max 6
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L))
      .map(k => (k, "x")).toDF("k", "pad")
    val out = Skew.skewProfile(rows, "k", 2).collect()
      .sortBy(_.getInt(0))
    assert(out.length == 2)
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) ==
      ((1L, 6L, 600000L, 600000L)))
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3), r2.getLong(4)) ==
      ((2L, 2L, 200000L, 800000L)))
    // counts sorted = [1,1,2,6]: p50 = 1.5 (interp), p99 = 2+0.97*4 = 5.88
    assert(r1.getLong(5) == 4L)             // n_keys
    assert(r1.getLong(6) == 10L)            // total_rows
    assert(r1.getDouble(7) == 1.5)          // p50_cnt
    assert(r1.getDouble(8) == 5.88)         // p99_cnt
    assert(r1.getLong(9) == 6L)             // max_cnt
    assert(r1.getDouble(10) == 2.4)         // skew_ratio = 6*4/10
    assert(r1.getLong(11) == 3L)            // ceil(2.4)
  }

  test("skewProfile: DISK_ONLY pin above the measured gate is " +
    "row-identical to the checkpoint pin") {
    import spark.implicits._
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L))
      .map(k => (k, "x")).toDF("k", "pad")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    val pinned = canon(Skew.skewProfile(rows, "k", 2))
    val spilled = canon(Skew.skewProfile(rows, "k", 2,
      maxPinnedInputRows = 1L)) // force the DISK_ONLY pin
    assert(pinned.nonEmpty && (pinned sameElements spilled) ||
      pinned.toSeq == spilled.toSeq,
      "crossing the storage gate must not move a row")
  }
}
