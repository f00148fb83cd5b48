package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

/** Bucketing — the pre-shuffle co-location strategy for repeated joins
  * on the same key (the 100 TB answer to "this fact-fact join runs
  * every hour"): both sides written with `bucketBy(n, key)` hash-place
  * rows so the join needs NO exchange at read time, amortizing one
  * write-time shuffle over every subsequent join.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans without exchanges") {
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS cust_bucketed")
    // a fresh JVM has an empty in-memory catalog but the warehouse dirs
    // survive on disk — clear them or saveAsTable hits LOCATION_ALREADY_EXISTS
    Seq("ev_bucketed", "cust_bucketed").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.events(spark, sf()).select("event_id", "user_id", "value")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("ev_bucketed")
    Tables.customer(spark, sf()).select("c_custkey", "c_name")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("cust_bucketed")

    val joined = spark.table("ev_bucketed")
      .join(spark.table("cust_bucketed"),
        col("user_id") === col("c_custkey"))
    // disable broadcast so the planner must choose a co-located join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      val expected = Tables.events(spark, sf())
        .join(Tables.customer(spark, sf()), col("user_id") === col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("a point lookup on the bucket key prunes to 1 of 8 buckets " +
    "(the serving-path read saving bucketing also buys)") {
    // writes its own ev_pruned bucketed table — standalone by design
    val dir = new java.io.File("/tmp/graft_warehouse/ev_pruned")
    if (dir.exists()) {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
    spark.sql("DROP TABLE IF EXISTS ev_pruned")
    Tables.events(spark, sf()).select("event_id", "user_id", "value")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("ev_pruned")
    // autoBucketedScan drops the bucketed read when no join/agg benefits
    // — it does not credit FILTER pruning, so a serving path that lives
    // on point lookups pins it off (the files are sorted by the key, so
    // row-group stats prune within the one selected bucket too)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("ev_pruned").where(col("user_id") === 42)
      val p = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning must cut the scan to one bucket:\n$p")
      val expected = Tables.events(spark, sf())
        .where(col("user_id") === 42).count()
      assert(q.count() === expected, "pruned scan must not change results")
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }
}
