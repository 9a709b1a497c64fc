package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial-aggregable per-group top-k: keep the k largest
  * (value, id) pairs, ordered (value DESC, id ASC) — id breaks ties
  * deterministically AND uniquely identifies the winning rows.
  *
  * This is the scale answer to "top-k per key": the window form
  * (`row_number() OVER (PARTITION BY key ORDER BY v DESC)`) sorts
  * EVERY row of every group after shuffling them all; this buffer is
  * bounded at k pairs per (partition, group), combines map-side like
  * any aggregate, and the shuffle carries at most k pairs per group
  * per partition. Same partial/final shape as [[TopKMin]], carrying
  * (value, id) so callers can re-join or explode the winners.
  */
final class TopKByDesc(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better than"

  private def merged(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortWith(lt).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.length < k || lt(a, b.last)) merged(b :+ a) else b

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    merged(b1 ++ b2)

  override def finish(reduction: Seq[(Double, Long)]): Seq[(Double, Long)] =
    reduction

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
