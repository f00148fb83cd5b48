package graft.queries

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive Query Execution evidence — the runtime re-planning the
  * 100 TB design leans on (VERDICT/BASELINE scale notes assume AQE is
  * live): a join whose build side turns out small must CONVERT to
  * broadcast at runtime, and a shuffle that lands tiny partitions must
  * COALESCE them. These are executed-plan assertions (isFinalPlan),
  * not config reads — if an upgrade or a conf regression turned AQE
  * off, value-level tests would still pass and only this suite would
  * catch it.
  */
class AqeSpec extends SparkSpec {

  /** Run `f` with AQE forced on (and static broadcast planning off, so
    * any broadcast in the final plan is provably AQE's runtime call),
    * restoring previous conf values after.
    */
  private def withAqe[A](extra: (String, String)*)(f: => A): A = {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // static planning OFF, runtime (statistics-based) planning ON —
      // the split that makes broadcast decisions AQE's alone
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB") ++ extra
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan only on execution
    // the adaptive plan string appends an "== Initial Plan ==" section
    // (the pre-runtime plan) — assertions must read the final part only
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("AQE converts a sort-merge join to broadcast at runtime when the " +
    "build side turns out small") {
    withAqe() {
      val small = Tables.nation(spark, sf()).where(col("n_regionkey") === 0)
      val big = Tables.customer(spark, sf())
      val p = finalPlan(big.join(small, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n")))
      assert(p.contains("isFinalPlan=true"), p)
      // static planning was disabled (threshold -1), so this broadcast
      // is AQE's runtime statistics-based conversion
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }

  test("AQE coalesces undersized shuffle partitions") {
    withAqe("spark.sql.shuffle.partitions" -> "32") {
      val p = finalPlan(Tables.orders(spark, sf())
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n")))
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("AQEShuffleRead coalesced"), p)
    }
  }

  test("AQE splits a skewed join partition") {
    // one hot key: ~all build rows share user_id 1; thresholds lowered
    // so the skew detector fires at test scale
    withAqe(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // one hot key holds ~99% of rows, with an incompressible payload
      // so the hot shuffle partition's BYTES (post-compression — what
      // the skew detector measures) dwarf the others
      val skewed = spark.range(20000)
        .select((when(col("id") % 100 =!= 0, 1L).otherwise(col("id")))
          .as("k"), md5(col("id").cast("string")).as("payload"))
      val other = spark.range(200).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      // global agg downstream, NOT a groupBy on the join key: skew
      // splitting destroys the join's hash partitioning, so the rule
      // (correctly) refuses when a downstream stage would have to
      // re-shuffle — the realistic skew-join shape aggregates on other
      // columns or writes out
      val p = finalPlan(skewed.join(other, "k")
        .agg(sum(length(col("payload"))).as("bytes")))
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skewed=true") || p.contains("isSkew=true") ||
        p.contains("AQEShuffleRead skewed"), p)
    }
  }
}
