package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

/** Z-order layout: key correctness against a plain-Scala bit
  * interleave, and the scale claim itself — a 2-d box predicate
  * overlaps FEWER files' min/max envelopes under z-order than under a
  * single-column sort (the stats-pruning proxy: a parquet reader must
  * touch exactly the overlapping files).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def zRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a.toLong >> i) & 1L) << (2 * i)
      z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue16 matches the reference bit interleave") {
    val samples = Seq((0, 0), (1, 0), (0, 1), (65535, 65535),
      (12345, 54321), (40000, 7), (7, 40000), (32768, 32767))
    val got = samples.toDF("a", "b")
      .select(Layout.zValue16(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got === samples.map { case (a, b) => zRef(a, b) })
  }

  private def zRefN(vals: Seq[Int], bits: Int): Long = {
    val k = vals.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until k)
      z |= ((vals(j).toLong >> i) & 1L) << (i * k + j)
    z
  }

  test("zValueN matches the reference interleave for 3 dims and reduces " +
    "to zValue for 2") {
    val samples = Seq(Seq(0, 0, 0), Seq(63, 63, 63), Seq(1, 2, 4),
      Seq(40, 7, 63), Seq(33, 44, 55))
    val df = samples.map { case Seq(a, b, c) => (a, b, c) }.toDF("a", "b", "c")
    val got = df.select(
      Layout.zValueN(Seq(col("a"), col("b"), col("c")), 6).as("z3"),
      Layout.zValue(col("a"), col("b"), 6).as("z2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    samples.zip(got).foreach { case (s, (z3, z2)) =>
      assert(z3 == zRefN(s, 6), s"3-dim interleave of $s")
      assert(z2 == zRefN(s.take(2), 6), s"2-dim interleave of $s")
    }
  }

  test("3-dim z-order still prunes a single-dimension box better than a " +
    "sort on a different leading column") {
    val ev = Tables.events(spark, sf("sf0.01"))
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("ts_sec"))
    val path = "/tmp/graft_layout_spec/zorder3"
    Layout.writeZOrderedN(ev, path, Seq("user_id", "value", "ts_sec"),
      numFiles = 16)
    val z = spark.read.parquet(path)
    assert(z.exceptAll(ev).count() == 0 && ev.exceptAll(z).count() == 0)
    val zFiles = Layout.filesOverlapping(z, ("value", 40.0, 60.0))
    // 3 dims dilute pruning vs the 2-dim layout, but a value box must
    // still skip files — a user_id sort skips none
    assert(zFiles < 16, s"3-dim z-order should prune a value box ($zFiles/16)")
  }

  test("z-order prunes the non-leading dimension; a single sort cannot; " +
    "content round-trips unchanged") {
    val ev = Tables.events(spark, sf("sf0.01"))
      .select("event_id", "user_id", "value")
    val zPath = "/tmp/graft_layout_spec/zorder"
    val sPath = "/tmp/graft_layout_spec/sorted"
    Layout.writeZOrdered(ev, zPath, "user_id", "value", numFiles = 16)
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sPath)

    val z = spark.read.parquet(zPath)
    val s1 = spark.read.parquet(sPath)
    assert(z.exceptAll(ev).count() == 0 && ev.exceptAll(z).count() == 0,
      "layout must not change content")

    // a predicate on `value` alone: the user_id-sorted layout leaves
    // every file's value range wide open, z-order confines it
    val zFiles = Layout.filesOverlapping(z, ("value", 40.0, 60.0))
    val sFiles = Layout.filesOverlapping(s1, ("value", 40.0, 60.0))
    assert(sFiles >= 15, s"user_id sort should NOT prune value ($sFiles)")
    assert(zFiles * 2 <= sFiles,
      s"z-order should halve the files a value box touches: z=$zFiles sorted=$sFiles")

    // the 2-d box the CORRECTNESS query uses prunes at least as hard
    val zBox = Layout.filesOverlapping(z,
      ("user_id", 100.0, 119.0), ("value", 40.0, 60.0))
    assert(zBox <= zFiles, s"2-d box must prune at least the value dim ($zBox)")
  }
}
