package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe (r13): quantify how much work Bench's `.count()`
  * forcing lets ColumnPruning drop, per query shape, vs a forcing that
  * computes every output column (`queryExecution.toRdd` iteration —
  * the physical plan for the FULL output schema, no driver transfer).
  * Interleaved A/B/A/B sampling (4 each, median reported) so ambient
  * drift hits both protocols equally.
  */
object ProbeForcing {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names: Seq[String] = if (args.length > 1) args(1).split(',').toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    graft.plans.TopKPerKey.ensureRegistered(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var (sumC, sumR) = (0.0, 0.0)
    println(f"${"query"}%-34s ${"count()"}%9s ${"toRdd"}%9s  ratio")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val cs = collection.mutable.ListBuffer.empty[Double]
      val rs = collection.mutable.ListBuffer.empty[Double]
      try {
        for (_ <- 1 to 4) {
          cs += time { fn(spark, sfDir).count() }
          rs += time {
            val rdd = fn(spark, sfDir).queryExecution.toRdd
            rdd.foreachPartition(it => while (it.hasNext) it.next())
          }
        }
        val (c, r) = (cs.sorted.apply(1), rs.sorted.apply(1))
        sumC += c; sumR += r
        println(f"$n%-34s $c%9.3f $r%9.3f  ${r / c}%.2fx")
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage.take(120)}")
      }
    }
    println(f"TOTAL count=$sumC%.1f toRdd=$sumR%.1f ratio=${sumR / sumC}%.3fx")
    spark.stop()
  }
}
