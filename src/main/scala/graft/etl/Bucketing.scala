package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the pre-paid shuffle. `bucketBy(k, key)` at write
  * time hash-partitions rows into k bucket files; reading the table
  * back exposes that layout to the planner, so joins / aggregations on
  * the bucket key need NO exchange. This is the 100 TB pattern for a
  * fact table that is joined on the same key by many downstream jobs:
  * pay its shuffle once at ingest, never again (vs. re-shuffling
  * ~100 TB per join). Sort-merge co-location beats broadcast only when
  * BOTH sides are too big to broadcast — for a dim side use
  * `broadcast()` and skip bucketing entirely.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`), not
  * the parquet files — the files themselves stay plain parquet (the
  * DuckDB oracle reads them directly); an external path pins them
  * where callers want. The in-memory catalog (no Hive) keeps this
  * process-local: concurrent Verify/Bench runs each rebuild their own
  * catalog entry over their own namespaced path.
  */
object Bucketing {

  /** Write `df` as an external bucketed table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
