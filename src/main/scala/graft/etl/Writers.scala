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
    *
    * Works through the Hadoop `FileSystem` API (any supported store,
    * not just local disk): sizes the tree recursively, detects a
    * Hive-partitioned layout (partition columns = dataframe columns
    * absent from the physical files) and re-applies `partitionBy` on
    * rewrite. The swap is two renames with a crash window; a crashed
    * run leaves `<path>__old` + no `<path>`, which the next call
    * recovers by renaming `__old` back before compacting.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val dst = new HPath(path)
    val fs: FileSystem = dst.getFileSystem(spark.sessionState.newHadoopConf())
    val bak = new HPath(path + "__old")
    // crash recovery: a previous run died between the two renames
    if (!fs.exists(dst) && fs.exists(bak)) fs.rename(bak, dst)
    val df = spark.read.parquet(path)
    val bytes = fs.getContentSummary(dst).getLength
    // partition cols don't exist in the physical files — diff against
    // one leaf file's footer schema
    val leaves = fs.listFiles(dst, true)
    var leaf: Option[HPath] = None
    while (leaves.hasNext && leaf.isEmpty) {
      val f = leaves.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        leaf = Some(f.getPath)
    }
    val fileCols = leaf.map(p => spark.read.parquet(p.toString).columns.toSet)
      .getOrElse(df.columns.toSet)
    val partCols = df.columns.filterNot(fileCols).toSeq
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    import org.apache.spark.sql.functions.col
    val repart =
      if (partCols.nonEmpty) df.repartition(nFiles, partCols.map(col): _*)
      else df.repartition(nFiles)
    val sorted =
      if (sortCols.nonEmpty) repart.sortWithinPartitions(sortCols.map(col): _*)
      else repart
    val tmp = new HPath(path + "__compacting")
    val writer = sorted.write.mode("overwrite")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(tmp.toString)
    // two-rename swap (same filesystem); crash window recovered above
    fs.delete(bak, true)
    fs.rename(dst, bak)
    fs.rename(tmp, dst)
    fs.delete(bak, true)
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
