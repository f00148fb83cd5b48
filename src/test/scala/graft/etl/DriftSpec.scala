package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def totalPsi(rows: Seq[(Long, Long)]): Double =
    Drift.psiByBucket(rows.toDF("id", "f"), "f",
        col("id") < 1000L, col("id") >= 1000L,
        bucketWidth = 50, maxBucket = 3)
      .agg(sum("psi_term")).head().getDouble(0)

  test("PSI is ~0 for an identical split and large for a shifted batch") {
    val old = (0L until 400L).map(i => (i, (i % 200) * 1L))
    // matched batch: same distribution, disjoint ids
    val same = (1000L until 1400L).map(i => (i, (i % 200) * 1L))
    // shifted batch: all mass lands in the top bucket
    val shifted = (1000L until 1400L).map(i => (i, 150L + (i % 50)))
    val psiSame = totalPsi(old ++ same)
    val psiShift = totalPsi(old ++ shifted)
    assert(math.abs(psiSame) < 0.01,
      s"identical distributions must score ~0, got $psiSame")
    assert(psiShift > 0.25,
      s"a batch concentrated in one bucket must cross the 0.25 " +
        s"industry 'shifted' line, got $psiShift")
  }

  test("full bucket domain: empty buckets emit smoothing-only terms, " +
    "negative features clamp to bucket 0, and rows in neither slice " +
    "never move the score") {
    def psiMap(rows: Seq[(Long, Long)]) =
      Drift.psiByBucket(rows.toDF("id", "f"), "f",
          col("id") < 1000L, col("id") >= 1000L && col("id") < 2000L,
          bucketWidth = 50, maxBucket = 3)
        .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
    // all mass in bucket 1; buckets 0/2/3 must still appear
    val base = Seq((1L, 60L), (2L, 70L), (1001L, 60L))
    val m = psiMap(base)
    assert(m.keySet == Set(0, 1, 2, 3), m.keySet.toString)
    assert(m(2)._1 == 0L && m(2)._2 == 0L && m(2)._3 != 0.0,
      "an empty bucket carries its add-1 smoothing term")
    // a negative feature lands in bucket 0, not a bucket below the domain
    val neg = psiMap(base :+ (3L, -120L))
    assert(neg.keySet == Set(0, 1, 2, 3))
    assert(neg(0)._1 == 1L)
    // a row in NEITHER slice (id >= 2000) leaves every term unchanged —
    // even when it lands in an otherwise-empty bucket
    assert(psiMap(base :+ (5000L, 170L)) == m,
      "neither-slice rows must not perturb the full-domain PSI")
  }

  test("PSI terms are partitioning-invariant (exact integer counts, " +
    "single-expression terms)") {
    val rows = (0L until 1000L).map(i => (i, i % 337)).toDF("id", "f")
    def run(df: org.apache.spark.sql.DataFrame) =
      Drift.psiByBucket(df, "f", col("id") % 10 =!= 7, col("id") % 10 === 7,
          bucketWidth = 50, maxBucket = 6)
        .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(run(rows) == run(rows.repartition(13)))
  }

  test("ksDistance matches a hand-computed two-sample CDF gap") {
    // A = {0.5, 1.5, 2.5}, B = {1.5, 3.5} — values span four floor
    // buckets, so the bucket-offset path is exercised. Integer gaps
    // |fa·nb − fb·na|: 2 at 0.5, 1 at 1.5, 3 at 2.5, 0 at 3.5 →
    // D = 3/(3·2) = 0.5 at v = 2.5
    val rows = (Seq(0.5, 1.5, 2.5).map(("a", _)) ++
      Seq(1.5, 3.5).map(("b", _))).toDF("grp", "v")
    val r = Drift.ksDistance(rows, "v",
      col("grp") === "a", col("grp") === "b").head()
    assert(r.getDouble(0) == 2.5)  // at_value
    assert(r.getLong(1) == 3L)     // d_num
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.5)  // ks_d
  }

  test("ksDistance tie on the gap resolves to the smallest value and " +
    "ignores neither-slice rows") {
    // A = {1}, B = {2}: gap 1 at v=1, 0 at v=2 → at_value 1, ks 1.0;
    // a neither-slice row at v=0.5 must not create a grid point
    val rows = Seq(("a", 1.0), ("b", 2.0), ("x", 0.5)).toDF("grp", "v")
    val r = Drift.ksDistance(rows, "v",
      col("grp") === "a", col("grp") === "b").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("ksDistance is partitioning-invariant") {
    val rows = (0L until 500L).map(i => (i, (i % 97).toDouble / 7))
      .toDF("id", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Drift.ksDistance(df, "v", col("id") % 2 === 0, col("id") % 2 === 1)
        .head().toSeq
    assert(run(rows) == run(rows.repartition(13)))
  }
}
