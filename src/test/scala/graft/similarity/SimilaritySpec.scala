package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),   // identical
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))   // opposite
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k: ranks are 1..k, best-first, self excluded") {
    val emb = Tables.embeddings(spark, sf())
    val out = Similarity.bruteForceTopK(
      emb.where($"vec_id" < 3), emb, "vec_id", "embedding", k = 5)
    val rows = out.collect()
    assert(rows.length == 15)
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to 5))
      assert(sorted.map(_.getDouble(3)).toSeq.reverse.sorted.reverse ==
        sorted.map(_.getDouble(3)).toSeq, "scores must be non-increasing")
      assert(!rs.exists(_.getLong(1) == q), "self must be excluded")
    }
  }

  test("LSH top-k recall vs brute force is usable (> 0.5 on random data)") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, emb, "vec_id", "embedding", 10,
      numPlanes = 16, bands = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"LSH recall@10 = $recall%.2f (candidates from 8 bands × 2 bits)")
    assert(recall > 0.5, f"recall $recall%.2f too low")
  }

  test("IVF top-k recall vs brute force is usable (> 0.5 with nprobe=8/16)") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 10,
      numCells = 16, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF recall@10 = $recall%.2f (nprobe 8 of 16 cells)")
    assert(recall > 0.5, f"recall $recall%.2f too low")
    val ranks = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 10,
      numCells = 16, nprobe = 8)
      .groupBy("query_id").agg(max("rank").as("m"), count(lit(1)).as("n"))
      .collect()
    ranks.foreach(r => assert(r.getInt(1) == r.getLong(2).toInt,
      "ranks must be dense 1..n per query"))
  }

  test("cosineNearDups finds the corpus' top pairs and nothing below threshold") {
    val emb = Tables.embeddings(spark, sf())
    val out = Similarity.cosineNearDups(emb, "vec_id", "embedding", 0.4,
      numPlanes = 16, bands = 8).collect()
    assert(out.forall(_.getDouble(2) >= 0.4))
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("deterministic across runs: same seed → same LSH output") {
    val emb = Tables.embeddings(spark, sf())
    def run() = Similarity.lshTopK(emb.where($"vec_id" < 3), emb,
      "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run() == run())
  }
}
