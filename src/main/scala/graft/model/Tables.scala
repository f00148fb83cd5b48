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

  /** Normalize an events frame's `ts` to a µs TimestampType column,
    * whatever the on-disk representation: INT64 nanos (read via the
    * nanosAsLong legacy conf — Spark's vectorized reader rejects
    * TIMESTAMP(NANOS) otherwise), TIMESTAMP_NTZ µs (plain parquet
    * timestamps; cast through the UTC session zone, value-identical),
    * or already TimestampType. The µs truncation matches what Spark
    * applies everywhere, and is harmless to the 1 s-or-coarser window
    * boundaries the queries group on.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** The TimestampNTZ branches of [[normalizeTs]]/[[eventsAfter]] cast
    * TS↔NTZ through the SESSION time zone, so they are value-correct
    * only under UTC — enforce it here (mirroring how nanosAsLong is
    * set) rather than trusting every entry point to have done so.
    */
  private def forceUtc(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.session.timeZone", "UTC")

  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    forceUtc(spark)
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Events filtered to `ts > watermarkEpochSec`, with the predicate on
    * the RAW on-disk column so it pushes into the parquet scan
    * (`PushedFilters: GreaterThan(ts, ...)` → row-group/page pruning).
    * Filtering the rebuilt/cast timestamp column instead would wrap the
    * scan column in an expression and push nothing — at 100 TB the
    * bookmark predicate MUST prune at the scan. The comparison literal
    * is typed to the physical column: epoch nanos for INT64 data, an
    * NTZ timestamp (via the UTC session zone) for TIMESTAMP_NTZ data.
    */
  def eventsAfter(spark: SparkSession, sfDir: String, watermarkEpochSec: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    forceUtc(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val pred = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") > watermarkEpochSec * 1000000000L
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts") > timestamp_seconds(lit(watermarkEpochSec)).cast("timestamp_ntz")
      case _ => col("ts") > timestamp_seconds(lit(watermarkEpochSec))
    }
    normalizeTs(raw.where(pred))
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
