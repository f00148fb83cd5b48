package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE/upsert: apply a changeset to a target table —
  * source rows update matching target rows (source wins column-wise)
  * and insert unmatched keys; target rows without a source row pass
  * through. The batch twin of the serving layer's put_item upsert
  * ([[graft.serve.Serving.KvStore]]) and the table-maintenance
  * operation every warehouse pipeline needs.
  *
  * Plan shape: one full-outer shuffle join on the key + a coalesce
  * Project — no driver-side loops, works at any scale the join works
  * at. For repeated merges into the same table, bucket both sides on
  * the key (see BucketingSpec) and the exchange disappears.
  */
object Upsert {

  /** Merge `source` into `target` on `key`. Columns present in both
    * take the source value when a source row matches; target-only
    * columns keep the target value (null for inserted rows).
    *
    * Duplicate-key handling (SQL MERGE raises on multiple matches; a
    * silent full-outer join would multiply rows instead):
    *  - `latestBy = Some(version)`: pre-dedupe the source to the row
    *    with the greatest version per key (ties broken by preferring
    *    later input order is NOT guaranteed — supply a total version);
    *  - `latestBy = None`: enforce uniqueness at execution time — a
    *    duplicated source key fails the query with a clear error.
    */
  def merge(target: DataFrame, source: DataFrame, key: String,
            latestBy: Option[String] = None): DataFrame = {
    val perKey = Window.partitionBy(col(key))
    val src = latestBy match {
      case Some(v) =>
        source.withColumn("__rn", row_number().over(perKey.orderBy(col(v).desc)))
          .where(col("__rn") === 1).drop("__rn")
      case None =>
        // assert_true survives in the Filter (side-effecting, not
        // prunable); returns null on success so IsNull(…) passes rows
        source.withColumn("__keyn", count(lit(1)).over(perKey))
          .where(assert_true(col("__keyn") <= 1,
            concat(lit(s"MERGE: duplicate source key '$key'="),
              col(key).cast("string"))).isNull)
          .drop("__keyn")
    }
    val t = target.alias("__t")
    val s = src.alias("__s")
    val joined = t.join(s, col(s"__t.$key") === col(s"__s.$key"), "full_outer")
    val sourceCols = source.columns.toSet
    val outCols = target.columns.map { c =>
      if (c == key)
        coalesce(col(s"__s.$key"), col(s"__t.$key")).as(key)
      else if (sourceCols.contains(c))
        when(col(s"__s.$key").isNotNull, col(s"__s.$c"))
          .otherwise(col(s"__t.$c")).as(c)
      else col(s"__t.$c").as(c)
    } ++ source.columns.filterNot(target.columns.contains).map(c => col(s"__s.$c").as(c))
    joined.select(outCols.toSeq: _*)
  }
}
