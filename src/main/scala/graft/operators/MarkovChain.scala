package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded-matrix driver iteration for the behavioral Markov-chain
  * family (w68_markov_stationary, a95_entropy_rate): the transition
  * counts DISTRIBUTE (window + pair aggregate — the heavy part), and
  * only the resulting k×k matrix — bounded cluster METADATA, k ≤
  * [[MaxStates]] event types, the DistRank bucket-offset class — is
  * fetched to the driver for the pinned power iteration.
  *
  * Extracted so the pinned fold exists ONCE: both consumers previously
  * carried verbatim copies of the collect + dense-matrix + 20-step
  * loop, and a third consumer diverging one of them would silently
  * fork the fold order the oracles' recursive CTEs replicate.
  *
  * PINNED FOLD CONTRACT (what the oracle mirrors, do not reorder):
  * states are sorted lexicographically; each power step computes
  * nxt(j) = Σ_i term(i, j) with i ascending, where
  * term = p(i)·c(i)(j)/rs(i) when row i has outgoing mass, p(i) when
  * i == j on a massless row (self-loop completion), else 0 — the
  * identical (p·c)/r-then-add sequence the DuckDB recursive CTE folds,
  * so the result is bitwise portable across engines.
  */
object MarkovChain {

  /** Domain bound for the driver-side matrix — the guard that keeps
    * this a metadata fetch, not a data collect. The events table has
    * ≤ 5 event types; 64 leaves headroom for any realistic label
    * vocabulary while still rejecting an unbounded-key misuse. */
  val MaxStates = 64

  /** Driver-side dense view of a transition-count table. */
  final case class Transitions(states: Array[String],
                               counts: Array[Array[Double]],
                               rowSums: Array[Double]) {
    def k: Int = states.length
  }

  /** Collect a (from: string, to: string, n: long) count table into
    * the dense sorted-state matrix. The collect is bounded by
    * construction (≤ k² cells) and guarded by [[MaxStates]]. */
  def fromCounts(t: DataFrame): Transitions = {
    val cells = t.collect()
    val states = cells.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    require(states.length <= MaxStates,
      s"MarkovChain is a bounded-METADATA driver fold: got " +
        s"${states.length} states > MaxStates=$MaxStates — a key domain " +
        "this large must stay distributed (see DistRank)")
    val idx = states.zipWithIndex.toMap
    val kk = states.length
    val c = Array.ofDim[Double](kk, kk)
    cells.foreach(r =>
      c(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2).toDouble)
    Transitions(states, c, Array.tabulate(kk)(i => c(i).sum))
  }

  /** `steps` synchronous power-iteration steps from a point mass on
    * the first (sorted) state — the pinned fold (see class doc). */
  def stationary(tr: Transitions, steps: Int = 20): Array[Double] = {
    val kk = tr.k
    val c = tr.counts
    val rs = tr.rowSums
    var p = Array.tabulate(kk)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to steps) {
      val nxt = Array.fill(kk)(0.0)
      var j = 0
      while (j < kk) {
        var acc = 0.0
        var i = 0
        while (i < kk) {
          // rows with no outgoing mass hold the chain in place —
          // the same self-loop completion the oracle applies
          val term =
            if (rs(i) > 0) p(i) * c(i)(j) / rs(i)
            else if (i == j) p(i)
            else 0.0
          acc += term
          i += 1
        }
        nxt(j) = acc
        j += 1
      }
      p = nxt
    }
    p
  }
}
