package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r13): does wrapping a registered query in `count()`
  * (Bench's forcing) change the physical plan vs the plan a consumer of
  * the full output gets? Prints operator histograms of both plans.
  */
object ProbePlanUnderCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(',').toSeq
      else Seq("sim_topk_pq", "window_top_order_per_customer", "q1_agg",
        "scalar_embedding_quantize")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    graft.plans.TopKPerKey.ensureRegistered(spark)
    def ops(plan: String): Map[String, Int] =
      plan.linesIterator
        .map(_.dropWhile(c => !c.isLetter).takeWhile(c => c.isLetterOrDigit))
        .filter(_.nonEmpty).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val full = ops(df.queryExecution.executedPlan.toString)
      val cnt = ops(df.groupBy().count().queryExecution.executedPlan.toString)
      val keys = (full.keySet ++ cnt.keySet).toSeq.sorted
      println(s"== $n")
      keys.foreach { k =>
        val (a, b) = (full.getOrElse(k, 0), cnt.getOrElse(k, 0))
        if (a != b) println(f"   $k%-30s full=$a count=$b")
      }
    }
    spark.stop()
  }
}
