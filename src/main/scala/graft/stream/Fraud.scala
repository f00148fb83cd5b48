package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship streaming computation, in batch-checkable
  * form (SURVEY.md §2.4 A1 + §2.2 P4/P5, `flink_app/app.py:70-83`):
  * tumbling event-time window, grouped SUM(valor), HAVING sum > 5000,
  * projecting the window end as the result timestamp.
  *
  * Two variants, per SURVEY.md §7.5 risk 3:
  *  - [[windowSum]] — the *intended* semantics: group by entity key +
  *    window, so sums genuinely aggregate multiple records.
  *  - [[literalParity]] — the *literal* reference grouping, which also
  *    includes the unique transaction id (`flink_app/app.py:78`), making
  *    the window-sum degenerate to a per-record filter.
  *
  * Both use Spark's `window()` (a plain projection of
  * `floor(epoch/slide)*slide` — no shuffle beyond the groupBy itself) and
  * emit the window start/end as **bigint epoch seconds** so the DuckDB
  * oracle can reproduce them with `floor(epoch(ts)/w)*w` without
  * timestamp/timezone hazards. Aggregates are rounded to 2dp on both
  * sides (SURVEY.md §7.5 risk 2).
  *
  * Scale: the groupBy shuffles by (key, window); at 100 TB that is the
  * same keyed exchange Flink would do, with AQE coalescing small
  * partitions. The streaming twin lives in
  * [[graft.streaming.StreamingFraud]].
  */
object Fraud {

  /** Intended fraud semantics: per-user 10s tumble, sum(value) > threshold. */
  def windowSum(events: DataFrame, windowSec: Int, threshold: Double): DataFrame =
    events
      .groupBy(col("user_id"), window(col("ts"), s"$windowSec seconds"))
      .agg(round(sum("value"), 2).as("total_value"))
      .where(col("total_value") > lit(threshold))
      .select(
        col("user_id"),
        unix_timestamp(col("window.start")).as("window_start"),
        unix_timestamp(col("window.end")).as("window_end"),
        col("total_value"))

  /** Literal parity with flink_app/app.py:78 — the unique id is part of
    * the grouping key, so each group is a single record.
    */
  def literalParity(events: DataFrame, windowSec: Int, threshold: Double): DataFrame =
    events
      .groupBy(col("user_id"), col("event_id"), window(col("ts"), s"$windowSec seconds"))
      .agg(round(sum("value"), 2).as("value"))
      .where(col("value") > lit(threshold))
      .select(
        col("user_id"),
        col("event_id"),
        col("value"),
        unix_timestamp(col("window.end")).as("window_end"))
}
