package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the SURVEY §2.4/§2.9 "Aggregator[IN,BUF,OUT]" extension
  * category): element-wise mean of an embedding column.
  *
  * The buffer is one (sums, count) pair of fixed size `dim` —
  * `reduce` folds rows map-side and `merge` combines partial buffers
  * across partitions, so the shuffle carries one buffer per group per
  * partition, not the vectors themselves. That partial-aggregation
  * shape is exactly what scales an embedding-centroid computation to
  * 100 TB (contrast with collect_list + driver math, which ships every
  * vector).
  *
  * Mean addition order varies with partitioning (floating point), so
  * results are deterministic only to ~1e-12 — use the sorted-fold
  * formulation (queries q35) when bit-exactness against an oracle is
  * required.
  */
class VectorMeanAggregator[I](dim: Int, extract: I => Array[Float])
  extends Aggregator[I, (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), row: I): (Array[Double], Long) = {
    val v = if (row == null) null else extract(row)
    if (v != null) {
      val n = math.min(dim, v.length)
      var i = 0
      while (i < n) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    } else b
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) new Array[Double](dim)
    else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
