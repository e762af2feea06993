package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored observation feeding [[TopKAgg]]. */
case class Scored(v: Double, id: Long)

/** Typed mergeable top-k aggregate (the custom-`Aggregator` tier of
  * the custom-operator ladder, next to the Catalyst expressions and
  * the EwmAvg window function).
  *
  * WHY over a window: `row_number() over (partition by g order by v)
  * <= k` shuffles EVERY row to its group's reducer and sorts there.
  * An Aggregator gets a map-side partial: each input partition keeps
  * at most k rows per group before the exchange, so the shuffle
  * carries O(groups × k) rows instead of O(n) — at 100 TB that is
  * the difference between a broadcast-sized exchange and a full
  * re-materialization. Same reason TakeOrdered beats global sort for
  * `t_bottomk`.
  *
  * Determinism: ordering is (v DESC, id ASC) — a total order, so the
  * kept set and its order are unique regardless of partitioning or
  * merge order. The buffer is kept sorted+trimmed at every step;
  * merge is a bounded merge of two ≤k lists.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], String] {
  require(k > 0)

  private def trim(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(e => (-e.v, e.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  /** ids joined ":" in rank order — integer-only, hash-portable. */
  override def finish(b: Seq[Scored]): String =
    trim(b).map(_.id).mkString(":")

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
