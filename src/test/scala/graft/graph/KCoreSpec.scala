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

  test("harness graph at the registered (k=20, 10 rounds) is converged: " +
    "an 11th round drops nobody, and the peel genuinely cascaded") {
    val e = Triangles.coPurchaseEdges(
      graft.model.Tables.lineitem(spark, sf()), partMod = 4)
    val r10 = KCore.kCoreTruncated(e, "src", "dst", 20, 10)
    val r11 = KCore.kCoreTruncated(e, "src", "dst", 20, 11)
    val n10 = r10.count()
    assert(n10 == r11.count())
    assert(r10.where($"degree" < 20).count() == 0)
    // more than one round did work (a one-shot threshold filter would
    // not need the loop)
    val r1 = KCore.kCoreTruncated(e, "src", "dst", 20, 1)
    assert(r1.count() > n10)
  }
}
