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
  * merge order. The buffer invariant is sorted+trimmed after every
  * step, so `reduce` is O(1) for any row that does not beat the
  * current k-th (almost all rows once the buffer fills) and `finish`
  * reads the buffer as-is.
  *
  * Inputs must be NON-NULL: `Scored` uses primitive fields (the
  * cheap encoder); filter nulls out before aggregating (the w24
  * query does) — unlike a window rank, which would sort nulls last.
  * NaN scores ARE ordered (largest-first, `java.lang.Double.compare`
  * total order in BOTH the skip-check and the sort — primitive >/==
  * would disagree with the sort on NaN and make the kept set depend
  * on partition order), and -0.0 < 0.0 consistently.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], String] {
  require(k > 0)

  private def beats(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.v, b.v)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def trim(xs: Seq[Scored]): Seq[Scored] =
    xs.sortWith(beats).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size == k && !beats(a, b.last)) b else trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  /** ids joined ":" in rank order — integer-only, hash-portable. */
  override def finish(b: Seq[Scored]): String = b.map(_.id).mkString(":")

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
