package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.model.Tables

/** TPC-H-shaped headline queries over the harness tables (q1 lives in
  * BreadthQueries; this file adds the classic multi-join plans: q3, q5,
  * q6, q10, q18). The reference pipeline has no joins at all (SURVEY.md
  * §2.3) — these are the "would a warehouse user of this engine be
  * served" queries, and the ones whose physical plans matter most at
  * 100 TB.
  *
  * Scale shapes (audited in PlanAuditSpec):
  *  - dimension sides (customer-filtered-by-segment, nation, region,
  *    supplier) broadcast; the lineitem/orders fact sides stream —
  *    no shuffle of the big table for dim joins;
  *  - fact-fact (lineitem ⋈ orders) shuffles once on orderkey and AQE
  *    picks SMJ/shuffled-hash at real scale;
  *  - q18's "large orders" subquery is a self-aggregation of lineitem
  *    on the SAME key as the subsequent join, so the shuffle is reused;
  *  - date filters sit directly on the scan (PushedFilters), so
  *    partition/row-group pruning does the heavy lifting at 100 TB;
  *  - top-k (q3/q10/q18 LIMIT) runs as TakeOrderedAndProject — heap,
  *    no global sort.
  *
  * Oracle parity: fp-sensitive sums of products run in DECIMAL(18,2)
  * and cast to double at the end (exact, order-insensitive — the
  * pattern proven by tpch_q1/join_fact_fact_revenue); LIMIT queries
  * carry a total-order tiebreak so the selected set is deterministic.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))
  private val one = lit(1).cast(DecimalType(18, 2))

  /** sum(extprice * (1 - discount)) as an exact decimal, emitted double. */
  private def revenue = sum(dec("l_extendedprice") * (one - dec("l_discount")))
    .cast("double").as("revenue")

  private val revenueSql =
    """CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue"""
      .stripMargin

  def defs: Map[String, Q] = Map(

    // q3 — shipping priority: unshipped high-value orders for one
    // segment. customer(segment-filtered) broadcasts; orders⋈lineitem
    // shuffles on orderkey; LIMIT 10 = heap top-k.
    "tpch_q3_shipping_priority" -> ((s, dir) => {
      val pivot = lit("1997-06-01").cast("timestamp")
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).where(col("o_orderdate") < pivot)
      val l = Tables.lineitem(s, dir).where(col("l_shipdate") > pivot)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(revenue)
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    }),

    // q5 — local supplier volume: 6-way join, revenue per nation for
    // one region-year where customer and supplier share a nation.
    // nation/region/supplier broadcast; customer⋈orders and ⋈lineitem
    // shuffle on their keys.
    "tpch_q5_local_supplier_volume" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
               col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenue)
    }),

    // q6 — forecast revenue change: pure scan-filter-agg; every
    // predicate reaches the parquet scan (PushedFilters), one partial+
    // final agg, no shuffle of data rows.
    "tpch_q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
               col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
               col("l_quantity") < 24)
        .agg(sum(dec("l_extendedprice") * dec("l_discount"))
          .cast("double").as("revenue"))),

    // q10 — returned-item reporting: revenue lost to returns per
    // customer in a quarter; nation broadcasts, LIMIT 20 heap top-k.
    "tpch_q10_returned_items" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
               col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      val n = Tables.nation(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenue)
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    }),

    // q18 — large-volume customers: the "orders whose total quantity
    // exceeds T" subquery aggregates lineitem on l_orderkey — the SAME
    // key as the join that follows, so at scale the exchange is shared,
    // and the semi-join side is tiny (p99 cutoff) → broadcast.
    "tpch_q18_large_volume_customer" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val big = l.groupBy(col("l_orderkey"))
        .agg(round(sum("l_quantity"), 2).as("big_qty"))
        .where(col("big_qty") > 250)
        .select(col("l_orderkey").as("big_orderkey"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      l.join(broadcast(big), col("l_orderkey") === col("big_orderkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
          "o_totalprice", "sum_qty")
    })
  )

  def oracles: Map[String, String] = Map(

    "tpch_q3_shipping_priority" ->
      s"""SELECT l_orderkey, $revenueSql, CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "tpch_q5_local_supplier_volume" ->
      s"""SELECT n_name, $revenueSql
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    "tpch_q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06
        |  AND l_quantity < 24""".stripMargin,

    "tpch_q10_returned_items" ->
      s"""SELECT c_custkey, c_name, $revenueSql, c_acctbal, n_name
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "tpch_q18_large_volume_customer" ->
      """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |       o_totalprice, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin
  )
}
