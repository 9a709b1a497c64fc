package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (`Aggregator[IN, BUF, OUT]` — the UDAF
  * escalation path named in SURVEY.md §2.10): the k smallest values
  * of a group, ascending.
  *
  * The buffer is a bounded sorted Seq (≤ k elements), so partial
  * aggregation is map-side: each partition reduces to at most k
  * doubles before the shuffle, and `merge` is an O(k) two-pointer
  * combine — the same partial/final shape as a built-in min, carrying
  * k values instead of one. Output is a deterministic multiset (ties
  * keep duplicate values), so oracle comparison is exact with no
  * float arithmetic at all — values pass through untouched.
  */
final class TopKMin(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[Double] = Vector.empty

  override def reduce(b: Seq[Double], a: Double): Seq[Double] =
    if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
    (b1 ++ b2).sorted.take(k)

  override def finish(reduction: Seq[Double]): Seq[Double] = reduction

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
