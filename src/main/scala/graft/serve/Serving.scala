package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-layer semantics as DataFrame ops (SURVEY.md §2.2 P6/P7,
  * §2.6, §2.1 S10):
  *
  *  - [[pointLookup]] ⇔ DynamoDB `query` with
  *    `KeyConditionExpression: numero_cartao = :k` returning items in
  *    sort-key order (`lambda_app/api/function.py:38-46`,
  *    `realtime.py:220-221`).
  *  - [[scanAll]] ⇔ DynamoDB full `scan` (`api/function.py:31`).
  *  - [[withTtl]] ⇔ the consumer's `TTL = now + 30d` stamping
  *    (`consumer/function.py:12`); here the TTL anchors on event time so
  *    the result is deterministic and oracle-checkable.
  *
  * Scale: a point lookup compiles to a Filter pushed into the parquet
  * scan (`PushedFilters: [EqualTo(user_id,...)]`) — with partitioned or
  * bucketed data Catalyst prunes to the matching files only, which is the
  * honest cluster analog of a KV read.
  */
object Serving {

  val TtlSeconds: Long = 30L * 24 * 3600 // consumer/function.py:12

  def pointLookup(df: DataFrame, keyCol: String, key: Long, sortCol: String): DataFrame =
    df.filter(col(keyCol) === lit(key)).orderBy(col(sortCol))

  def scanAll(df: DataFrame): DataFrame = df

  /** Stamp a TTL column: event-time epoch seconds + 30 days. */
  def withTtl(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("ttl", unix_timestamp(col(tsCol)) + lit(TtlSeconds))
}
