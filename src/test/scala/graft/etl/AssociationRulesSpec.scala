package graft.etl

import graft.SparkSpec

class AssociationRulesSpec extends SparkSpec {
  import spark.implicits._

  test("mineRules: hand-computed confidence and lift, both directions") {
    // baskets: {1,2} ×3, {1,3} ×1, {2} ×1, {3} ×1  → N=6
    // c(1)=4, c(2)=4, c(3)=2; pair (1,2): cab=3; pair (1,3): cab=1
    // minCount=2 keeps only (1,2):
    //   1→2 conf 3/4 = 750000; lift 6·3/(4·4) = 1.125 → 1125000
    //   2→1 conf 3/4 = 750000; same lift
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L), (14L, 2L), (15L, 3L))
      .toDF("basket", "item")
    val out = AssociationRules.mineRules(rows, "basket", "item",
        minCount = 2L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5))).toSeq
    assert(out == Seq(
      (1L, 2L, 3L, 750000L, 1125000L, 1),
      (2L, 1L, 3L, 750000L, 1125000L, 2)))
  }

  test("string item ids survive (no lossy numeric cast)") {
    // pre-fix, cast("long") nulled every alphabetic id → one pseudo-item
    val rows = Seq((1L, "ml"), (1L, "nlp"), (2L, "ml"), (2L, "nlp"),
      (3L, "ml")).toDF("basket", "item")
    val out = AssociationRules.mineRules(rows, "basket", "item", 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // N=3, c(ml)=3, c(nlp)=2, c(ml,nlp)=2
    // ml→nlp conf 2/3→666667, lift 3·2/(3·2)=1→1000000; nlp→ml conf 10⁶
    assert(out.toSet == Set(
      ("ml", "nlp", 2L, 666667L, 1000000L),
      ("nlp", "ml", 2L, 1000000L, 1000000L)))
  }

  test("duplicate items within a basket collapse before counting") {
    val rows = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L))
      .toDF("basket", "item")
    val out = AssociationRules.mineRules(rows, "basket", "item", 2L, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pair (7,8) co-occurs in both baskets exactly twice, not three times
    assert(out.toSeq.map(_._3).forall(_ == 2L) && out.length == 2)
  }
}
