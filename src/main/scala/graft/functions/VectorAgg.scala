package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]` — the extension point
  * SURVEY.md §2.10 reserves for north-star operators): elementwise mean
  * of an embedding column per group.
  *
  * The buffer is a fixed-size double array + count; `reduce` folds rows
  * in partition order (map-side partial aggregation), `merge` combines
  * partials associatively across the shuffle — so the exchange carries
  * one (dim+1)-double buffer per (group × partition), not the vectors.
  * Uses: per-label centroids, IVF coarse-quantizer training, class
  * prototypes for embedding classifiers.
  */
object VectorAgg {

  case class VecBuf(sums: Array[Double], var n: Long)

  class VecMeanAgg(dim: Int) extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.fill(dim)(0.0), 0L)

    override def reduce(b: VecBuf, a: Seq[Float]): VecBuf = {
      val n = math.min(dim, a.length)
      var i = 0
      while (i < n) { b.sums(i) += a(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(x: VecBuf, y: VecBuf): VecBuf = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: VecBuf): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = ExpressionEncoder[VecBuf]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column function: elementwise mean of a float-array column. */
  def vecMean(dim: Int): Column => Column = {
    val fn = udaf(new VecMeanAgg(dim), ExpressionEncoder[Seq[Float]]())
    (c: Column) => fn(c)
  }
}
