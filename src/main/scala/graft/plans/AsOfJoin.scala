package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the same key
  * and the greatest right-timestamp <= left-timestamp. The operator
  * Spark lacks natively (reference surface has no joins at all —
  * SURVEY.md §2.3 — this is north-star breadth; DuckDB states it as
  * `ASOF JOIN` in the oracle).
  *
  * Implementation is the scalable composition, not a theta-join: union
  * both sides tagged, shuffle once on the key, sort within key by
  * (ts, side), and carry the most recent right payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame. Cost is
  * one exchange + one sort over |L|+|R| — never the |L|×|R| expansion a
  * range-condition join would plan — and both sides stream through the
  * window operator. Right rows sort before left rows at equal
  * timestamps, giving the inclusive (`<=`) match.
  */
object AsOfJoin {

  /** @param leftTs/rightTs timestamp columns (must be mutually comparable)
    * @param rightPayload right columns to carry onto matched left rows
    * Output: all left columns + rightPayload; left rows with no earlier
    * right row are dropped (inner as-of semantics, like DuckDB).
    *
    * The payload travels as ONE struct column carried by a single
    * `last(ignoreNulls)`: all payload fields always come from the same
    * right row (carrying columns independently could mix rows when
    * payload values are null), and the match test is the struct's own
    * nullness — null-safe even when every payload field of the matched
    * row is null.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(right.schema.fieldIndex(c))))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__rp"): _*)
    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__rp"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(col("*"), last(col("__rp"), ignoreNulls = true).over(w).as("__rpc"))
    carried
      .where(col("__side") === 1 && col("__rpc").isNotNull)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__rpc").getField(c).as(c)): _*)
  }
}
