package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the
  * Structured Streaming surface the window/watermark operators can't
  * express (arbitrary per-key state machines; Flink's
  * `KeyedProcessFunction` analog, beyond the reference's windowed-agg
  * surface at `flink_app/app.py:74-80`).
  *
  * Semantics: per user, accumulate lifetime spend; emit one alert row
  * the moment the running total crosses `threshold` (an upward
  * crossing: `total-before < threshold <= total-after`). The batch twin
  * [[batchSpendAlerts]] states the same thing as a running-sum window
  * predicate, is DuckDB-oracle-checkable, and the spec asserts
  * stream == batch on ordered replay.
  *
  * Scale: state is one double per user key, distributed by the
  * groupByKey shuffle; no window buffering, no growth with event count.
  * A production deployment would add a `GroupStateTimeout` eviction
  * policy (e.g. event-time timeout past the card's TTL — the serving
  * layer's 30-day TTL analog, `consumer/function.py:12`).
  */
object StatefulSpend {

  case class Txn(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  case class SpendState(total: Double)
  case class Alert(user_id: Long, alert_epoch: Long, total_at_alert: Double)

  /** Streaming form: per-key running total in GroupState, alerts on the
    * upward crossing. Events within a micro-batch are applied in
    * (tsMicros, event_id) order; cross-batch order is the arrival order,
    * with state carrying the total across batches.
    */
  def streamingSpendAlerts(txns: Dataset[Txn], threshold: Double): Dataset[Alert] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Txn], state: GroupState[SpendState]) =>
          var total = state.getOption.map(_.total).getOrElse(0.0)
          val alerts = Seq.newBuilder[Alert]
          batch.toSeq.sortBy(t => (t.tsMicros, t.event_id)).foreach { t =>
            val before = total
            total += t.value
            if (before < threshold && total >= threshold)
              alerts += Alert(uid, Math.floorDiv(t.tsMicros, 1000000L),
                BigDecimal(total).setScale(2, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble) // HALF_UP = Spark round()'s mode
          }
          state.update(SpendState(total))
          alerts.result().iterator
      }
  }

  /** Batch twin: the same alert set as a running-sum window predicate
    * over (user_id, ts, event_id)-ordered events. Crossing condition is
    * written on the unrounded running sum, identically to the DuckDB
    * oracle.
    */
  def batchSpendAlerts(events: DataFrame, threshold: Double): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("running", sum("value").over(w))
      .where(col("running") >= threshold &&
        col("running") - col("value") < threshold)
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("alert_epoch"),
        round(col("running"), 2).as("total_at_alert"))
  }

  /** Adapt the harness `events` table to the typed stream input. */
  def asTxns(events: DataFrame): Dataset[Txn] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tsMicros"), col("value")).as[Txn]
  }
}
