package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class WritersSpec extends SparkSpec {

  test("partitionedParquet writes Hive-style dirs and scans prune partitions") {
    val out = Files.createTempDirectory("graft_writer").toString
    val staged = EventsStage.stage(Tables.events(spark, sf()))
    Writers.partitionedParquet(staged, out, Seq("k_bucket"))

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("k_bucket=")), dirs.mkString(","))

    val read = spark.read.parquet(out)
    assert(read.count() == staged.count())

    // partition pruning: a filter on the partition column must show up as
    // a PartitionFilter, not a data filter
    val plan = read.where(col("k_bucket") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(k_bucket"), plan)
  }

  test("gzipJson lands newline-delimited gzip files (Firehose raw analog)") {
    val out = Files.createTempDirectory("graft_raw").toString
    val events = Tables.events(spark, sf()).select("event_id", "event_type", "value")
    Writers.gzipJson(events, out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    val back = spark.read.json(out)
    assert(back.count() == events.count())
  }

  test("csv round-trips with schema (header + explicit timestamp format)") {
    val out = Files.createTempDirectory("graft_csv").toString
    val events = Tables.events(spark, sf())
      .select("event_id", "ts", "event_type", "value")
    Writers.csv(events, out)
    val back = spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(events.schema)
      .csv(out)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).count() == 0, "values must round-trip exactly")
  }

  test("compact rewrites many small files into few, preserving rows") {
    val out = Files.createTempDirectory("graft_compact").toString + "/t"
    val events = Tables.events(spark, sf()).select("event_id", "user_id", "value")
    events.repartition(32).write.mode("overwrite").parquet(out)
    def nFiles = new java.io.File(out).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = nFiles
    assert(before >= 32)
    Writers.compact(spark, out, targetFileBytes = 1L << 30,
      sortCols = Seq("user_id"))
    assert(nFiles === 1, s"expected 1 file after compaction, got $nFiles")
    assert(spark.read.parquet(out).count() === events.count())
  }

  test("compact preserves a Hive-partitioned layout (sizes recursively, re-partitions)") {
    val out = Files.createTempDirectory("graft_compact_part").toString + "/t"
    val events = Tables.events(spark, sf())
      .select("event_id", "user_id", "value", "event_type")
    events.repartition(8).write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    def partDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    def leafFiles(d: java.io.File) =
      d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    val dirsBefore = partDirs.map(_.getName).toSet
    assert(dirsBefore.nonEmpty)
    assert(partDirs.map(leafFiles).sum > dirsBefore.size, "needs many small files")
    Writers.compact(spark, out, targetFileBytes = 1L << 30)
    // layout survives: same partition dirs, fewer files, same rows+schema
    assert(partDirs.map(_.getName).toSet === dirsBefore)
    partDirs.foreach(d => assert(leafFiles(d) === 1, s"${d.getName}: ${leafFiles(d)}"))
    val back = spark.read.parquet(out)
    assert(back.count() === events.count())
    assert(back.columns.toSet === events.columns.toSet)
  }
}
