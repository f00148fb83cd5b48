package graft.etl

import org.apache.spark.sql.functions.{col, concat, lit}
import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profileTable: typed channels, nulls and distincts, any schema") {
    val df = Seq(
      (Some(1L), Some("x"), Some(2.5)),
      (Some(1L), None, Some(-1.0)),
      (None, Some("a"), None))
      .toDF("k", "s", "v")
    val p = Profiler.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) == 3L && k.getLong(2) == 1L && k.getLong(3) == 1L)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 1.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "x")
    val v = p("v")
    assert(v.getDouble(4) == -1.0 && v.getDouble(5) == 2.5)
  }

  test("profileTable: exact-distinct channels are collision-safe for " +
    "complex/binary/NTZ types (r15 advice)") {
    // the ', '-joined string render would collapse array('a, b') with
    // array('a','b') and a null element with the string 'null'; the
    // JSON channel must keep all four distinct
    val arr = Seq(
      (1L, Seq("a, b"), Array[Byte](0x61)),
      (2L, Seq("a", "b"), Array[Byte](0xFF.toByte)),
      (3L, Seq(null.asInstanceOf[String]), Array[Byte](0xFE.toByte)),
      (4L, Seq("null"), Array[Byte](0x61))).toDF("id", "tags", "blob")
    val pa = Profiler.profileTable(arr).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(pa("tags") == 4L,
      s"complex-type channel collided: n_distinct=${pa("tags")} (want 4)")
    // binary: two invalid-UTF8 singleton byte arrays share one string
    // replacement render but must count separately through base64
    assert(pa("blob") == 3L,
      s"binary channel collided: n_distinct=${pa("blob")} (want 3)")
    // NTZ: distinct wall-clock values must not funnel through the
    // session timezone (DST-gap collapse); string render is zone-free
    val ntz = Seq("2026-03-08 02:30:00", "2026-03-08 03:30:00",
      "2026-03-08 03:30:00")
      .toDF("t").select(col("t").cast("timestamp_ntz").as("t"))
    val pn = Profiler.profileTable(ntz).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(pn("t") == 2L, s"NTZ channel drifted: ${pn("t")} (want 2)")
  }

  test("fuzzySelfMatch: blocking bounds candidates; distance filter " +
    "keeps only near names") {
    import org.apache.spark.sql.functions.expr
    val df = Seq((1L, "user_aa"), (2L, "user_ab"), (3L, "user_zz"),
      (4L, "admin_aa")).toDF("id", "name")
    val out = Profiler.fuzzySelfMatch(df, "id", "name",
        expr("substring(name, 1, length(name) - 2)"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 1-2 match (dist 1, same block); 3 same block but dist 2; 4 is in
    // another block entirely — never even a candidate
    assert(out == Set((1L, 2L, 1)))
  }

  test("profileTable: timestamps profile as epoch micros") {
    val df = Seq(5L, 10L).toDF("sec")
      .select(col("sec").cast("timestamp").as("ts"))
    val r = Profiler.profileTable(df).collect()(0)
    assert(r.getDouble(4) == 5e6 && r.getDouble(5) == 1e7)
  }

  test("profileTable: no Expand in EITHER plan, approx cardinalities " +
    "within the HLL error envelope, everything else exact") {
    val df = spark.range(20000).select(col("id"),
      (col("id") % 1000).as("k"),
      concat(lit("u"), col("id") % 3000).as("s"))
    val exact = Profiler.profileTable(df)
    val approx = Profiler.profileTable(df, approxDistinct = true)
    // Spark's multi-distinct Expand (input ×(cols+1), full-width rows,
    // one wide agg key) is exactly what BOTH modes must avoid: approx
    // via HLL sketches, exact via the narrow typed-posting explode
    // (r15 — the Expand plan measured a 2000× cliff at the 6M-row
    // scale once its wide hash map outgrew memory)
    assert(!exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact mode must distinct-reduce narrow postings, never Expand")
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx mode must be one expand-free pass")
    // and the posting distinct must agree with Spark's own countDistinct
    val truth = df.select(
      org.apache.spark.sql.functions.countDistinct(col("id")),
      org.apache.spark.sql.functions.countDistinct(col("k")),
      org.apache.spark.sql.functions.countDistinct(col("s"))).head()
    val em = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(em("id") == truth.getLong(0) && em("k") == truth.getLong(1) &&
      em("s") == truth.getLong(2), s"exact distincts drifted: $em vs $truth")
    val e = exact.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val a = approx.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a.keySet == e.keySet)
    a.foreach { case (cname, (nRows, nNulls, nDist)) =>
      val (eRows, eNulls, eDist) = e(cname)
      assert(nRows == eRows && nNulls == eNulls,
        s"$cname: only n_distinct may be approximate")
      // HLL++ at rsd=0.05: allow a generous 4σ = 20% envelope so the
      // spec never flakes while still catching a broken sketch
      assert(math.abs(nDist - eDist).toDouble / eDist <= 0.20,
        s"$cname: approx $nDist vs exact $eDist outside envelope")
    }
  }
}
