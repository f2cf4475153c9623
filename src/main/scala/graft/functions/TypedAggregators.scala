package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` instances — the Dataset-API extension surface
  * SURVEY §2.10 names alongside the Catalyst `TypedImperativeAggregate`s
  * in `graft.plans`: where those plug into SQL/DataFrame plans (codegen,
  * SQL registration), an `Aggregator` gives a type-safe
  * `KeyValueGroupedDataset.agg` building block with Encoder-backed
  * buffers — the idiomatic tool when the caller already works in typed
  * Datasets.
  */
object TypedAggregators {

  /** Elementwise centroid of fixed-dimension Float vectors: buffer =
    * (running sums, count); merge = vector add — associative and
    * partition-order-free, the same mergeable shape as
    * [[graft.plans.CovarianceAgg]] restricted to first moments.
    * Null/wrong-length rows are skipped, mirroring CovarianceAgg's
    * poison-row rule. */
  final class VecCentroid[T](d: Int, get: T => Seq[Float])
      extends Aggregator[T, (Array[Double], Long), Array[Double]] {

    override def zero: (Array[Double], Long) = (new Array[Double](d), 0L)

    override def reduce(
        b: (Array[Double], Long), row: T): (Array[Double], Long) = {
      val v = get(row)
      if (v == null || v.length != d) b
      else {
        var i = 0
        while (i < d) { b._1(i) += v(i); i += 1 }
        (b._1, b._2 + 1)
      }
    }

    override def merge(
        a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < d) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

    override def finish(b: (Array[Double], Long)): Array[Double] =
      if (b._2 == 0) new Array[Double](d)
      else b._1.map(_ / b._2)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
