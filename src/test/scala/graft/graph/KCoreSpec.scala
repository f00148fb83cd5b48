package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // triangle {1,2,3} with a chain 3-4-5-6 hanging off it: the classic
  // multi-round peel — each round exposes the next chain node
  private val chain = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
    (4L, 5L), (5L, 6L))

  private def run(edges: Seq[(Long, Long)], k: Int,
                  rounds: Int): Map[Long, Long] =
    KCore.kCoreTruncated(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-core of triangle+chain peels the chain one hop per round") {
    // converged (3 rounds): only the triangle survives, all degree 2
    assert(run(chain, 2, 3) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // truncated at 1 round: only the endpoint 6 is gone; 5 now dangles
    // with degree 1 — the truncation contract reports it as-is
    assert(run(chain, 2, 1) == Map(1L -> 2L, 2L -> 2L, 3L -> 3L,
      4L -> 2L, 5L -> 1L))
  }

  test("threshold above the max degree empties the graph") {
    assert(run(chain, 5, 2).isEmpty)
  }

  test("reversed duplicates and self-loops are canonicalised away") {
    val messy = chain ++ chain.map(_.swap) ++ Seq((1L, 1L))
    assert(run(messy, 2, 3) == run(chain, 2, 3))
  }

  test("harness graph at the registered (k=80, 6 rounds) is converged: " +
    "a 7th round drops nobody") {
    val e = Triangles.coPurchaseEdges(
      graft.model.Tables.lineitem(spark, sf()))
    val r6 = KCore.kCoreTruncated(e, "src", "dst", 80, 6)
    val r7 = KCore.kCoreTruncated(e, "src", "dst", 80, 7)
    assert(r6.count() == r7.count())
    assert(r6.where($"degree" < 80).count() == 0)
  }
}
