package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // median-of-N timing: one cold pass then repeats over a warm cache;
    // the median filters page-cache/JIT/GC noise a single pass can't
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    graft.plans.TopKPerKey.ensureRegistered(spark)
    // warm the session (JVM/codegen/file-index) so per-query numbers
    // measure the query, not first-action startup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Contention canary: a fixed CPU + 32-partition-shuffle probe whose
    // idle-box cost is recorded in BASELINE.md. Query timings can't
    // distinguish "code got slower" from "box was busy"; this probe can —
    // it exercises zero graft code, so any inflation here is machine load.
    // Median-of-3 before the run (back-compat `calibration_sec`), PLUS
    // one sample after each registry pass: hypervisor-neighbor load can
    // shift mid-run (two same-HEAD round-12 runs differed 12% at an
    // identical pre-run canary), so the emitted `calibration_samples`
    // band shows whether ambient held steady across the measurement.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(8000000L)
        .selectExpr("id % 10007 as k", "id as v")
        .groupBy("k").sum("v")
        .selectExpr("sum(`sum(v)`)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calibrationSec = List.fill(3)(calibrate()).sorted.apply(1)
    val calibSamples = collection.mutable.ListBuffer(calibrationSec)
    // dev-loop filter: comma-separated name substrings; NEVER set by the
    // driver (full registry is the graded run), only by hand while
    // iterating on one query's plan
    val only: String => Boolean = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(p) if p.nonEmpty =>
        val pats = p.split(',').toSeq; name => pats.exists(name.contains)
      case _ => _ => true
    }
    val names = SparkEntry.queries.keys.toSeq.filter(only).sorted
    val times = collection.mutable.Map.empty[String, List[Double]]
    // a broken query must be VISIBLE in the bench json, not a fast -1
    val errors = collection.mutable.Map.empty[String, String]
    for (_ <- 1 to runs) {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times(name) = ((System.nanoTime() - t0) / 1e9) :: times.getOrElse(name, Nil)
        } catch {
          case e: Throwable =>
            // raw message; proper JSON escaping happens at emission (jsonStr)
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
      }
      calibSamples += calibrate() // ambient drift, one sample per pass
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    // regression canary for the optimizer rule the window top-k queries
    // depend on: without the rewrite they plan a full sort+window
    val topkFires = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
      graft.model.Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .queryExecution.executedPlan.toString.contains("FinalTopK")
    }
    // millisecond precision: full-double repr overflowed the harness'
    // stdout tail-capture window last round (15 entries truncated)
    def ms(v: Double): Double = math.round(v * 1000) / 1000.0
    // one escape path for EVERY string field (keys, error messages, and
    // env-provided paths like sfDir/outFile alike): proper JSON escapes
    // for backslash/quote/control chars, no lossy substitution
    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '\\'           => "\\\\"
        case '"'            => "\\\""
        case c if c < ' '   => f"\\u${c.toInt}%04x"
        case c              => c.toString
      } + "\""
    val med = names.filter(times.contains).map(n => n -> median(times(n)))
    val qs = med.map { case (k, v) => jsonStr(k) + ":" + ms(v) }
      .mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = ms(med.map(_._2).sum)
    val calibArr = calibSamples.map(ms).mkString("[", ",", "]")
    // Canary-normalized total (r12 verdict: USE the calibration_samples
    // instrumentation, don't just emit it). Four same-night same-HEAD
    // r12 totals spanned 149.7-175.4 s (±12%) at identical pre-run
    // canaries because hypervisor-neighbor load shifted mid-run; the
    // canary band measures exactly that ambient. `value` stays the raw
    // graded number; `value_canary_norm` = value × (idle-anchor canary
    // / this run's canary mean) is the cross-round comparator — a run
    // on a 20%-loaded box normalizes DOWN to what the idle box would
    // have recorded. The 0.567 constant is the recorded idle-box canary
    // anchor (BASELINE.md round-11 capture, confirmed 0.570 in r12).
    val canaryIdleRef = 0.567
    val canaryMean = calibSamples.sum / calibSamples.size
    val totalNorm = ms(total * canaryIdleRef / canaryMean)
    // the session config, recorded so baseline_table.py renders what
    // actually ran instead of assuming the default
    val config = s"local[$cpus], shuffle=$cpus, UTC"
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"topk_rewrite_fires":$topkFires,"calibration_sec":${ms(calibrationSec)},"calibration_samples":$calibArr,"canary_mean":${ms(canaryMean)},"canary_idle_ref":$canaryIdleRef,"value_canary_norm":$totalNorm,"sf":${jsonStr(sfDir)},"config":${jsonStr(config)}}"""
    // The full per-query line also persists to a file, resolved to an
    // ABSOLUTE path so running outside the repo root can't silently
    // misplace it (r9 ADVICE); a failed write warns instead of vanishing.
    val outFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    ).getAbsolutePath
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (full + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARN: could not write $outFile: $e" +
        " — full-json stdout line below is the only copy")
    }
    // ORDER MATTERS. The driver captures only the last ~2000 chars of
    // stdout and parses the final JSON line it finds there. The full
    // per-query map is ~6 KB and can only grow, so it goes FIRST (and to
    // the file above); the ~300-byte compact summary must be the FINAL
    // line. (History: r9's null parse was sbt's trailing `[success]`
    // noise — fixed in build.sbt — while r10/r11's was the oversized
    // full-map line overflowing the tail window.)
    println(full)
    // errors is {} on a healthy run; if a pathological run pushes the
    // compact line past the tail window, ship a count + pointer instead
    val compactErrs =
      if (errs.length <= 1200) errs
      else s"""{"_truncated":${jsonStr(s"${errors.size} errors, see full_json")}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${med.size},"errors":$compactErrs,"error_count":${errors.size},"runs":$runs,"topk_rewrite_fires":$topkFires,"calibration_sec":${ms(calibrationSec)},"calibration_samples":$calibArr,"canary_mean":${ms(canaryMean)},"value_canary_norm":$totalNorm,"sf":${jsonStr(sfDir)},"full_json":${jsonStr(outFile)}}""")
    spark.stop()
  }
}
