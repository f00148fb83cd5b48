package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic one-pass table profiler — the "crawl this table and tell
  * me what's in it" primitive of catalog crawlers and data-quality
  * harnesses (Glue crawler statistics, Deequ/dbt column profiles):
  * per column, row/null/distinct counts and typed min/max.
  *
  * Schema-generic: the aggregate list is BUILT from `df.schema`, so
  * one function profiles any table. Numeric and timestamp extremes
  * land in `min_num`/`max_num` (timestamps as epoch-µs) and string
  * extremes in `min_str`/`max_str` — typed channels instead of a
  * cast-everything-to-string column, because string formatting of
  * doubles/timestamps is exactly where cross-engine comparison breaks.
  *
  * Scale shape: ONE pass building an array-of-structs aggregate row,
  * exploded to per-column rows. The exact multi-column
  * `count(DISTINCT)` plans through Spark's Expand (input ×(cols+1)) —
  * the honest cost of exact cardinalities. `approxDistinct = true` IS
  * the 100 TB mode: `approx_count_distinct` (HyperLogLog++, Heule et
  * al. 2013) replaces every distinct with a fixed-size sketch, the
  * Expand disappears (ProfilerSpec pins the plan), and the whole
  * profile is one expand-free partial-agg pass whatever the column
  * count — at the documented ~`rsd` relative cardinality error, all
  * other columns still exact.
  */
object Profiler {

  def profileTable(df: DataFrame, approxDistinct: Boolean = false,
                   rsd: Double = 0.05): DataFrame = {
    val distinctOf: Column => Column =
      if (approxDistinct) approx_count_distinct(_, rsd)
      else countDistinct(_)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val perCol: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val (mnN, mxN, mnS, mxS) = f.dataType match {
        case _: NumericType =>
          (round(min(c).cast("double"), 6), round(max(c).cast("double"), 6),
            nullS, nullS)
        case _: TimestampType | _: TimestampNTZType =>
          (min(unix_micros(c.cast("timestamp"))).cast("double"),
            max(unix_micros(c.cast("timestamp"))).cast("double"),
            nullS, nullS)
        case _: StringType =>
          (nullD, nullD, min(c), max(c))
        case _ => (nullD, nullD, nullS, nullS)
      }
      struct(lit(f.name).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
        distinctOf(c).as("n_distinct"),
        mnN.as("min_num"), mxN.as("max_num"),
        mnS.as("min_str"), mxS.as("max_str"))
    }
    df.agg(array(perCol: _*).as("__p"))
      .select(explode(col("__p")).as("__s"))
      .select(col("__s.*"))
  }

  /** Blocked fuzzy self-match (entity-resolution shape: a blocking key
    * + an edit-distance verifier — Fellegi–Sunter's candidate stage
    * with the standard blocking optimisation): rows sharing a block
    * key pair up and keep pairs with `levenshtein ≤ maxDist`. The
    * blocking key bounds candidates at Σ block² instead of n² — the
    * whole trick of ER at scale — at the documented recall cost that
    * matches differing WITHIN the key are never considered (run
    * multiple passes with different keys to recover them).
    *
    * Levenshtein is integer-exact and identically defined in Spark
    * and DuckDB, so the match set is oracle-checkable outright.
    */
  def fuzzySelfMatch(df: DataFrame, idCol: String, nameCol: String,
                     blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val t = df.select(col(idCol).cast("long").as("__id"),
      col(nameCol).as("__nm"), blockKey.as("__blk"))
    val a = t.select(col("__blk"), col("__id").as("id_a"),
      col("__nm").as("name_a"))
    val b = t.select(col("__blk"), col("__id").as("id_b"),
      col("__nm").as("name_b"))
    a.join(b, "__blk").where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
