package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of fixed-dimension float vectors — the typed
  * `Aggregator[IN, BUF, OUT]` custom-aggregation path (SURVEY.md §2.10:
  * "if we later need one, Aggregator is the idiomatic path"). Computes
  * per-label centroids for the IVF/embedding pipeline.
  *
  * Scale notes: the buffer is a primitive double array of `dims` entries —
  * merged associatively, so Catalyst runs it as partial aggregation
  * (map-side combine) like any built-in; a 1B-vector groupBy ships one
  * 64-double buffer per (partition, key), not the vectors. */
class VectorMean(dims: Int)
    extends Aggregator[Array[Float], VectorMean.Buf, Array[Double]] {

  override def zero: VectorMean.Buf = VectorMean.Buf(new Array[Double](dims), 0L)

  override def reduce(b: VectorMean.Buf, v: Array[Float]): VectorMean.Buf = {
    var i = 0
    while (i < dims && i < v.length) { b.sums(i) += v(i); i += 1 }
    b.copy(n = b.n + 1)
  }

  override def merge(a: VectorMean.Buf, b: VectorMean.Buf): VectorMean.Buf = {
    var i = 0
    while (i < dims) { a.sums(i) += b.sums(i); i += 1 }
    a.copy(n = a.n + b.n)
  }

  override def finish(b: VectorMean.Buf): Array[Double] =
    if (b.n == 0) new Array[Double](dims) else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VectorMean.Buf] = Encoders.product[VectorMean.Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VectorMean {
  final case class Buf(sums: Array[Double], n: Long)
}
