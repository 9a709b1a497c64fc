package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise vector sum over `array<long>` columns — the
  * centroid/IVF build-step aggregate.
  *
  * Replaces the posexplode → (key, dim) hash-agg → sort/collect_list
  * reassembly pattern: that shape shuffles |rows| × dim exploded
  * records (≈8M at sf0.1 for 64-dim embeddings) and re-sorts every
  * group to rebuild the array. Here the buffer IS the running sum
  * vector, so partial aggregation is map-side (each partition reduces
  * to one array per key before the shuffle) and the shuffle carries
  * |keys| × partitions arrays — the same partial/final shape as a
  * built-in `sum`, carrying dim longs instead of one.
  *
  * Long sums are exact and order-independent, so results are
  * bit-identical to the exploded formulation and to the oracle's
  * per-dimension SQL `sum()`. Null/empty inputs are ignored (an
  * all-null group sums to the empty vector, which callers never
  * produce: embedding vectors are non-null by schema).
  */
final class VecSum extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (a == null) b
    else if (b.length == 0) a.toArray
    else {
      require(a.length == b.length,
        s"VecSum: ragged input (${a.length} vs ${b.length})")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.length == 0) b2
    else if (b2.length == 0) b1
    else {
      require(b1.length == b2.length,
        s"VecSum: ragged buffers (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def finish(reduction: Array[Long]): Seq[Long] =
    reduction.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
