package graft.etl

import org.apache.spark.sql.DataFrame

/** Sink operators (SURVEY.md §2.1 S5-S8): the reference's partitioned
  * parquet writes (`stage.py:51-61`, `spec.py:67-77` — glueparquet +
  * snappy + `partitionKeys=["estado"]`) and the Firehose raw-zone landing
  * (`historical.py:204-270` — GZIP JSON, newline-delimited, 900s/128MB
  * buffering).
  *
  * Scale notes: `partitionBy` writes Hive-style `col=value/` directories
  * that downstream scans prune (`PruneFileSourcePartitions`);
  * `maxRecordsPerFile` bounds file sizes the way Firehose's buffer hints
  * do. At 100 TB add `sortWithinPartitions(partition cols)` upstream or
  * enable AQE coalescing so each dynamic partition gets few, large files
  * rather than one file per task × partition.
  */
object Writers {

  /** Partitioned parquet sink (S5/S6/S8 semantics). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         compression: String = "snappy",
                         maxRecordsPerFile: Long = 0L): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Raw-zone landing (S7 semantics): newline-delimited JSON, gzip. */
  def gzipJson(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("compression", "gzip")
      .json(path)

  /** Small-file compaction (lake maintenance): rewrite a parquet
    * directory into ~`targetFileBytes` files. The streaming raw zone
    * lands one file per micro-batch × partition (the Firehose
    * buffering analog, S7) — compaction keeps scan planning from
    * drowning in file metadata at 100 TB. Row-count-preserving; sorts
    * within partitions by `sortCols` when given so min/max row-group
    * stats stay selective (data-skipping friendly).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(path)
    val bytes = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length()).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val repart = df.repartition(nFiles)
    val sorted =
      if (sortCols.nonEmpty)
        repart.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else repart
    val tmp = path + "__compacting"
    sorted.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (same filesystem)
    val dst = new java.io.File(path)
    val bak = new java.io.File(path + "__old")
    dst.renameTo(bak)
    new java.io.File(tmp).renameTo(dst)
    import scala.reflect.io.Directory
    new Directory(bak).deleteRecursively()
  }

  /** CSV sink (beyond the reference — interchange-format table stakes):
    * header + explicit timestamp format so a read-back with the same
    * options round-trips losslessly.
    */
  def csv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)
}
