package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-level association-rule mining over (basket, item) pairs —
  * Agrawal & Srikant 1994's support/confidence framework with lift
  * (the level-2 slice of Apriori: itemset size 2, which is where the
  * quadratic risk lives; deeper levels recurse on the same shape).
  * The market-basket classic, and in a curation pipeline the tool for
  * "docs from source A also tend to carry tag B" co-occurrence rules.
  *
  * Determinism: support counts are exact longs; confidence and lift
  * round once to integer MICRO-units
  * (`conf = c(ab)/c(a)`, `lift = N·c(ab)/(c(a)·c(b))`) so the ranked
  * rule list is engine-exact; ties break on (antecedent, consequent).
  * Both ratios are computed as round-half-up via EXACT integer
  * arithmetic — `(2·num + den) div (2·den)` in decimal(38,0) — never
  * through doubles: N·c(ab)·10⁶ overflows a long past N ≈ 3×10⁶ equal
  * counts and exceeds a double's 2⁵³ integer range long before that,
  * so at corpus scale the long/double formulation silently corrupts
  * the ranking (same overflow class fixed in the moment sums,
  * ed71c05). Decimal(38,0) headroom: 2·N·c(ab)·10⁶ ≤ 2·10³² for
  * N ≤ 10¹³ baskets — exact far past 100 TB.
  *
  * Scale shape: the pair enumeration is the basket self-join — per
  * basket C(L,2) pairs, bounded by basket size, never by item-universe
  * size — feeding one partial-agg'd count; the `minCount` floor
  * shrinks the pair table BEFORE the two item-stat hash joins (same
  * filtered-pair discipline as PMI); N and the item counts are
  * model-sized. Top-k rules come off a bounded heap.
  */
object AssociationRules {

  /** Directed rules a→b AND b→a for every unordered item pair
    * co-occurring in at least `minCount` baskets, ranked by lift
    * (micro-units) desc, top `k`. Input columns: (basketCol, itemCol);
    * duplicates within a basket collapse. Item ids pass through with
    * their input type (ordering for the `<` pair canonicalisation and
    * the tie-break comes from the column's natural order) — no cast,
    * so string ids survive instead of silently nulling to one item.
    */
  def mineRules(df: DataFrame, basketCol: String, itemCol: String,
                minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val bi = df.select(col(basketCol).as("__b"),
      col(itemCol).as("__i")).distinct()
    val n = bi.agg(countDistinct(col("__b")).as("__n"))
    val items = bi.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val a = bi.select(col("__b"), col("__i").as("__ia"))
    val b = bi.select(col("__b"), col("__i").as("__ib"))
    val pairs = a.join(b, "__b").where(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as("__cab"))
      .where(col("__cab") >= minCount)
    val directed = pairs.select(col("__ia").as("ante"),
        col("__ib").as("cons"), col("__cab"))
      .unionAll(pairs.select(col("__ib").as("ante"),
        col("__ia").as("cons"), col("__cab")))
    val scored = directed
      .join(items.select(col("__i").as("ante"), col("__ci").as("__ca")),
        "ante")
      .join(items.select(col("__i").as("cons"), col("__ci").as("__cb")),
        "cons")
      .crossJoin(broadcast(n))
      // round-half-up(num/den) = (2·num + den) div (2·den), exact in
      // decimal(38,0) — `div` (IntegralDivide) computes on the decimal
      // and emits BIGINT, so no double ever touches the ratio
      .select(col("ante"), col("cons"), col("__cab").as("pair_n"),
        expr("""(2 * CAST(__cab AS DECIMAL(38,0)) * 1000000 + __ca)
                div (2 * __ca)""").as("conf_micro"),
        expr("""(2 * CAST(__n AS DECIMAL(38,0)) * __cab * 1000000
                   + CAST(__ca AS DECIMAL(38,0)) * __cb)
                div (2 * CAST(__ca AS DECIMAL(38,0)) * __cb)""")
          .as("lift_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift_micro").desc, col("ante").asc, col("cons").asc)
    scored.orderBy(col("lift_micro").desc, col("ante").asc,
        col("cons").asc).limit(k)
      .select(col("ante"), col("cons"), col("pair_n"), col("conf_micro"),
        col("lift_micro"), row_number().over(w).cast("int").as("rank"))
  }
}
