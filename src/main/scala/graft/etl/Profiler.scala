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
  * Scale shape: the null/min/max/count channels are ONE partial-agg
  * pass building an array-of-structs aggregate row, exploded to
  * per-column rows. Exact cardinalities do NOT plan through Spark's
  * Expand (the multi-distinct rewrite: input ×(cols+1) rows carrying
  * the FULL row width into a hash agg keyed on every profiled column
  * at once — measured 352 s on a 6M×11 lineitem and 484 s at 60M, a
  * 2000× cliff from the 600k-row scale when the wide map outgrew
  * memory). Instead each row explodes into (col_id, typed value
  * channel) POSTINGS — one narrow struct per column, injective per
  * type (longs exact, doubles raw with SQL's −0.0/NaN grouping,
  * decimals/dates/etc. as canonical strings, timestamps as epoch-µs)
  * — and distinct-reduces per column through a map-side partial agg:
  * shuffle volume is Σ per-column cardinalities, never input
  * ×(cols+1), and no shuffled row is wider than one value. The two
  * 11-row result frames broadcast-join back together. Exact mode is
  * therefore exactly TWO scans of the input (summary pass + posting
  * pass; PlanAuditSpec pins the count) — the one-pass claim applies
  * to approx mode only.
  * `approxDistinct = true` remains the 100 TB mode:
  * `approx_count_distinct` (HyperLogLog++, Heule et al. 2013)
  * replaces every distinct with a fixed-size sketch and the whole
  * profile is ONE expand-free partial-agg pass whatever the column
  * count — ~`rsd` relative cardinality error, all other columns
  * still exact. ProfilerSpec pins both plans Expand-free.
  */
object Profiler {

  def profileTable(df: DataFrame, approxDistinct: Boolean = false,
                   rsd: Double = 0.05): DataFrame = {
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def summary(distinctOf: Option[Column => Column]): DataFrame = {
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
        struct(lit(f.name).as("col_name") +:
          count(lit(1)).as("n_rows") +:
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls") +:
          (distinctOf.map(d => Seq(d(c).as("n_distinct")))
            .getOrElse(Seq.empty) ++
            Seq(mnN.as("min_num"), mxN.as("max_num"),
              mnS.as("min_str"), mxS.as("max_str"))): _*)
      }
      df.agg(array(perCol: _*).as("__p"))
        .select(explode(col("__p")).as("__s"))
        .select(col("__s.*"))
    }
    if (approxDistinct)
      return summary(Some(approx_count_distinct(_, rsd)))
    // exact mode: narrow typed postings, per-column distinct reduce.
    // Channel choice must be INJECTIVE per column so distinct counts
    // are exact: integral types → long; float/double → double (group
    // semantics fold −0.0/NaN exactly like count(DISTINCT)); timestamps
    // → epoch-µs long; everything else (decimals, dates, booleans,
    // binary) → Spark's canonical string form, injective for atomic
    // types at fixed scale. Null raw values emit no posting —
    // count(DISTINCT) excludes nulls.
    val nullL = lit(null).cast("long")
    val postings: Seq[Column] = df.schema.fields.toSeq.zipWithIndex.map {
      case (f, i) =>
        val c = col(f.name)
        val (dv, lv, sv) = f.dataType match {
          case _: DoubleType | _: FloatType =>
            (c.cast("double"), nullL, nullS)
          case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
            (nullD, c.cast("long"), nullS)
          case _: TimestampType =>
            (nullD, unix_micros(c), nullS)
          // NTZ carries no zone: converting via the session timezone can
          // collapse distinct wall-clock values inside a DST gap. The
          // string render of NTZ is timezone-free and injective.
          case _: TimestampNTZType => (nullD, nullL, c.cast("string"))
          case _: StringType => (nullD, nullL, c)
          // base64 is injective on raw bytes; a UTF-8 string cast is not
          // (invalid sequences share one replacement render).
          case _: BinaryType => (nullD, nullL, base64(c))
          // Complex types: the ', '-joined string render collides
          // (array('a, b') vs array('a','b'); null element vs 'null') —
          // JSON escaping is collision-safe.
          case _: ArrayType | _: MapType | _: StructType =>
            (nullD, nullL, to_json(c))
          case _ => (nullD, nullL, c.cast("string"))
        }
        struct(lit(i).as("__ci"), dv.as("__d"), lv.as("__l"), sv.as("__s"))
    }
    val names = df.schema.fields.toSeq.zipWithIndex
      .map { case (f, i) => (i, f.name) }
    val nameOf = names.foldLeft(lit(null).cast("string")) {
      case (acc, (i, n)) => when(col("__ci") === i, lit(n)).otherwise(acc)
    }
    val dcounts = df
      .select(explode(array(postings: _*)).as("__v"))
      .select(col("__v.*"))
      .where(col("__d").isNotNull || col("__l").isNotNull ||
        col("__s").isNotNull)
      .distinct()
      .groupBy(col("__ci"))
      .agg(count(lit(1)).as("__nd"))
      .select(nameOf.as("col_name"), col("__nd"))
    summary(None)
      .join(broadcast(dcounts), Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("__nd"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
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
