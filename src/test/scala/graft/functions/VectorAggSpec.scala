package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("vecMean computes the elementwise mean per group") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)),
      (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f))
    ).toDF("label", "vec")
    val mean = VectorAgg.vecMean(2)
    val out = df.groupBy($"label").agg(mean($"vec").as("m"))
      .orderBy("label").collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0, 3.0))
    assert(out(1).getSeq[Double](1) === Seq(10.0, 20.0))
  }

  test("vecMean merges partials across partitions correctly") {
    val df = (1 to 1000).map(i => (0, Seq(i.toFloat))).toDF("label", "vec")
      .repartition(8)
    val mean = VectorAgg.vecMean(1)
    val m = df.groupBy($"label").agg(mean($"vec").as("m"))
      .collect().head.getSeq[Double](1).head
    assert(math.abs(m - 500.5) < 1e-9)
  }
}
