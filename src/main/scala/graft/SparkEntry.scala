package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{BreadthQueries, NorthStarQueries, ReferenceQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to
  * `(spark, sfDir) => DataFrame`; `oracleSql` carries the DuckDB twin for
  * every SQL-expressible query. Column names/aliases are identical on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("fraud_window_sum")(spark, "/root/testdata/sf0.001")

  /** Every query registry, in merge order. `queries`/`oracleSql` AND the
    * collision guard in SparkEntrySpec derive from this one list, so a
    * new registry file only has to be added here.
    */
  val registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ReferenceQueries.defs, ReferenceQueries.oracles),
      (BreadthQueries.defs, BreadthQueries.oracles),
      (NorthStarQueries.defs, NorthStarQueries.oracles),
      (TpchQueries.defs, TpchQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. Cached: the
    * registry maps are immutable literals, and per-query callers (Bench,
    * Verify) would otherwise pay the O(n) merge on every lookup.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  lazy val oracleSql: Map[String, String] = registries.map(_._2).reduce(_ ++ _)
}
