package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Mirrors the reference's catalog-scan surface (SURVEY.md §2.1 S3/S4:
  * `glue_scripts/stage.py:20-22`, `glue_scripts/spec.py:33-37` read Glue
  * Catalog tables backed by S3 parquet) — here a plain parquet scan per
  * table, which Catalyst serves with a vectorized reader, predicate
  * pushdown and column pruning. At cluster scale the same call works on
  * any Hadoop-compatible FS path; nothing here assumes local disk.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects by default. Read nanos as long (legacy conf), then
    * rebuild a microsecond TimestampType column — the same truncation
    * Spark applies everywhere (µs precision), and harmless to 1s-or-
    * coarser window boundaries the queries group on.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Events filtered to `ts > watermarkEpochSec`, with the predicate on
    * the RAW nanos long so it pushes into the parquet scan
    * (`PushedFilters: GreaterThan(ts, ...)` → row-group/page pruning).
    * Filtering the rebuilt timestamp column instead would wrap the scan
    * column in `timestamp_micros(div(...))` and push nothing — at
    * 100 TB the bookmark predicate MUST prune at the scan.
    */
  def eventsAfter(spark: SparkSession, sfDir: String, watermarkEpochSec: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("ts") > watermarkEpochSec * 1000000000L)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame = loadEvents(spark, sfDir)
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
