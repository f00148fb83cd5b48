package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval⋈point) join. Spark plans a bare
  * `a.key = b.key AND b.ts > a.start AND b.ts <= a.end` condition as a
  * nested-loop over each key group; at 100 TB that is quadratic death on
  * hot keys. The scale path is bucketization:
  *
  *  - points land in bucket `floor(ts/w)` (exactly one);
  *  - intervals explode to every bucket they overlap — with interval
  *    length capped near `w`, that is O(1) buckets per interval;
  *  - candidates come from an equi-join on (key, bucket) — shuffle
  *    volume is |L|+|R|·overlap, hash-partitioned like any other join —
  *    and the exact `(start, end]` residual filters in-stage.
  *
  * Each (interval, point) pair meets in exactly one bucket (the point's),
  * so no post-join dedup is needed.
  */
object RangeJoin {

  /** Inner interval⋈point join on `key` with `ts ∈ (start, end]`.
    * `startCol`/`endCol`/`tsCol` are epoch-long columns in the same unit
    * as `bucketWidth`. Output: all interval columns + all point columns.
    */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        intervalKey: String, pointKey: String,
                        startCol: String, endCol: String, tsCol: String,
                        bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    val pt = points.withColumn("__bucket",
      floor(col(tsCol) / bucketWidth))
    iv.join(pt,
      iv("__bucket") === pt("__bucket") &&
        iv(intervalKey) === pt(pointKey) &&
        pt(tsCol) > iv(startCol) && pt(tsCol) <= iv(endCol))
      .drop("__bucket")
  }
}
