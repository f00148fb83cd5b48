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
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(col("*") +: rightPayload.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"__r_$c")): _*)
    carried
      .where(col("__side") === 1 && col(s"__r_${rightPayload.head}").isNotNull)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__r_$c").as(c)): _*)
  }
}
