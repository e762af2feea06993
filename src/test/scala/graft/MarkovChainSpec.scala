package graft

import graft.operators.MarkovChain

class MarkovChainSpec extends SparkSpec {
  import spark.implicits._

  private def counts(rows: Seq[(String, String, Long)]) =
    rows.toDF("f", "g", "n")

  test("fromCounts builds the sorted-state dense matrix") {
    val tr = MarkovChain.fromCounts(counts(Seq(
      ("b", "a", 3L), ("a", "b", 1L), ("a", "a", 2L))))
    assert(tr.states.toSeq == Seq("a", "b"))
    assert(tr.counts(0).toSeq == Seq(2.0, 1.0))
    assert(tr.counts(1).toSeq == Seq(3.0, 0.0))
    assert(tr.rowSums.toSeq == Seq(3.0, 3.0))
  }

  test("stationary fold order is pinned: i ascending, (p·c)/r then add") {
    // Values chosen so the per-term division is inexact: a fold that
    // reorders the i-sum or distributes the division differently lands
    // on a different last ulp. Expected literals are the exact doubles
    // of the contractual sequence, computed independently below.
    val tr = MarkovChain.fromCounts(counts(Seq(
      ("a", "a", 1L), ("a", "b", 2L), ("a", "c", 4L),
      ("b", "a", 3L), ("b", "c", 1L),
      ("c", "b", 5L))))
    val got = MarkovChain.stationary(tr, 20)
    // independent replica of the pinned fold (kept verbatim from the
    // pre-extraction w68 body — the contract the oracles mirror)
    val kk = 3
    val c = Array(Array(1.0, 2.0, 4.0), Array(3.0, 0.0, 1.0),
      Array(0.0, 5.0, 0.0))
    val rs = Array(7.0, 4.0, 5.0)
    var p = Array(1.0, 0.0, 0.0)
    for (_ <- 1 to 20) {
      val nxt = Array.fill(kk)(0.0)
      var j = 0
      while (j < kk) {
        var acc = 0.0
        var i = 0
        while (i < kk) {
          acc += (if (rs(i) > 0) p(i) * c(i)(j) / rs(i)
                  else if (i == j) p(i) else 0.0)
          i += 1
        }
        nxt(j) = acc
        j += 1
      }
      p = nxt
    }
    assert(got.toSeq == p.toSeq) // BITWISE equality, not approx
    assert(math.abs(got.sum - 1.0) < 1e-12)
  }

  test("massless rows hold their mass (self-loop completion)") {
    // state c has no outgoing row → point mass reaching c stays at c
    val tr = MarkovChain.fromCounts(counts(Seq(("a", "c", 1L))))
    assert(tr.states.toSeq == Seq("a", "c"))
    val p = MarkovChain.stationary(tr, 20)
    assert(p.toSeq == Seq(0.0, 1.0))
  }

  test("MaxStates guard rejects unbounded key domains") {
    val big = (0 to MarkovChain.MaxStates).map(i =>
      (f"s$i%03d", f"s$i%03d", 1L))
    val e = intercept[IllegalArgumentException] {
      MarkovChain.fromCounts(counts(big))
    }
    assert(e.getMessage.contains("MaxStates"))
  }
}
