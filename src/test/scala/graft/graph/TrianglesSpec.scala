package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Triangles.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("K4 plus a pendant: hand-computed degrees, triangles, lcc") {
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, each node in 3 of them;
    // node 5 hangs off 4. deg(4)=4 so lcc(4)=2*3/(4*3)=0.5
    val got = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)))
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 3L, 1.0)))
    assert(got(3L) == ((3L, 3L, 1.0)))
    assert(got(4L) == ((4L, 3L, 0.5)))
    assert(got(5L) == ((1L, 0L, 0.0)))
  }

  test("canonicalisation: reversed duplicates and self-loops collapse") {
    // the same triangle stated three ways + a self-loop: one triangle
    val got = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 1L)))
    assert(got == Map(1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0))))
  }

  test("triangle-free graph (star) reports zeros") {
    val got = run(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L)
    assert(got(1L)._3 == 0.0)
  }

  test("global count matches the naive all-triples reference on a random-ish graph") {
    // deterministic pseudo-random graph over 12 nodes
    val edges = (for (a <- 1L to 12L; b <- (a + 1) to 12L
                      if (a * 31 + b * 17) % 3 == 0) yield (a, b)).toSeq
    val es = edges.toSet
    val want = (for (x <- 1L to 12L; y <- (x + 1) to 12L; z <- (y + 1) to 12L
                     if es((x, y)) && es((y, z)) && es((x, z)))
      yield 1).sum
    val got = run(edges)
    assert(got.values.map(_._2).sum == 3L * want)
  }

  test("graphSummary: hand-computed K4+pendant stats") {
    // K4 {1..4} + edge 4-5: n=5, m=7, T=4, W=3·C(3,2)+C(4,2)+0=15
    // transitivity 12/15 = 0.8; Newman sums over the 7 edges:
    // A=Σjk=67, B=Σ(j+k)=44, D=Σ(j²+k²)=146 →
    // r = (4·7·67−44²)/(2·7·146−44²) = −60/108 = −0.555556
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r = Triangles.graphSummary(e, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 7L, 4L, 15L)))
    assert(r.getDouble(4) == 0.8)
    assert(r.getDouble(5) == -0.555556)
  }

  test("graphSummary: stratified split sums (strata=1024) are " +
    "bit-identical to the default") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val a = Triangles.graphSummary(e, "src", "dst").collect()(0)
    val b = Triangles.graphSummary(e, "src", "dst", strata = 1024)
      .collect()(0)
    assert(a.toSeq == b.toSeq,
      "the corpus-scale strata escape must not change any value")
  }

  test("graphSummary: regular graph has undefined (null) assortativity") {
    // a 4-cycle is 2-regular: denominator is 0 → NULL, transitivity 0
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = Triangles.graphSummary(e, "src", "dst").collect()(0)
    assert(r.getLong(2) == 0L && r.getDouble(4) == 0.0)
    assert(r.isNullAt(5))
  }

  test("co-purchase harness graph is triangle-rich and canonical") {
    val e = Triangles.coPurchaseEdges(
      graft.model.Tables.lineitem(spark, sf()), partMod = 4)
    val rows = e.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val tri = Triangles.triangleCounts(e, "src", "dst")
    assert(tri.where($"triangles" > 0).count() > 0)
  }
}
