package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic grouped-aggregation constructor — the Spark-native rebuild of
  * the reference's `sparkAggregate` helper (`glue_scripts/spec.py:11-22`,
  * SURVEY.md §2.4 A2):
  *
  *  - aggregation functions are resolved **by name** (the reference does
  *    `getattr(pyspark.sql.functions, func)` — `spec.py:16`). Here a
  *    whitelisted table of codegen'd builtins, with an `expr(...)`
  *    fallback so any SQL aggregate name still resolves; a genuinely
  *    unknown name fails at analysis time, matching the reference's
  *    AttributeError behavior.
  *  - an **empty `groups` list falls back to a global aggregate**
  *    (`spec.py:17-21`).
  *
  * The produced plan is a plain `Aggregate`, so Spark runs it as partial
  * (map-side) HashAggregate → shuffle by group key → final HashAggregate.
  * At 100 TB the map-side partial combine is what keeps the shuffle
  * proportional to |groups|, not |rows| — nothing here defeats it.
  */
object Aggregation {

  final case class AggSpec(column: String, func: String, alias: Option[String] = None) {
    def outputName: String = alias.getOrElse(s"${func}_$column")
  }

  private val builtins: Map[String, Column => Column] = Map(
    "sum"            -> sum _,
    "avg"            -> avg _,
    "mean"           -> avg _,
    "min"            -> min _,
    "max"            -> max _,
    "count"          -> count _,
    "countDistinct"  -> ((c: Column) => count_distinct(c)),
    "count_distinct" -> ((c: Column) => count_distinct(c)),
    "first"          -> ((c: Column) => first(c)),
    "last"           -> ((c: Column) => last(c)),
    "stddev"         -> stddev _,
    "stddev_pop"     -> stddev_pop _,
    "variance"       -> variance _,
    "var_pop"        -> var_pop _,
    "collect_set"    -> collect_set _,
    "collect_list"   -> collect_list _,
    "approx_count_distinct" -> ((c: Column) => approx_count_distinct(c))
  )

  def resolve(spec: AggSpec): Column = {
    val c = builtins.get(spec.func) match {
      case Some(f) => f(col(spec.column))
      // name-by-string fallback, analogous to spec.py:16's getattr dispatch;
      // unknown functions raise at analysis, like the reference.
      case None    => expr(s"${spec.func}(`${spec.column}`)")
    }
    c.alias(spec.outputName)
  }

  /** `groupBy(groups).agg(aggs)`, or a global `df.agg(...)` when `groups`
    * is empty (spec.py:17-21's fallback branch).
    */
  def sparkAggregate(df: DataFrame, groups: Seq[String], aggs: Seq[AggSpec]): DataFrame = {
    require(aggs.nonEmpty, "sparkAggregate needs at least one aggregation")
    val exprs = aggs.map(resolve)
    if (groups.isEmpty) df.agg(exprs.head, exprs.tail: _*)
    else df.groupBy(groups.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }
}
