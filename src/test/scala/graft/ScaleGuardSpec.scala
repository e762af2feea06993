package graft

import org.apache.spark.sql.functions._

/** Round-6 scale guards: the pair-sampling budget on the O(n²)
  * rank-statistic queries and the bounded-buffer inverted-index
  * build. The driver's DuckDB gate pins full-enumeration parity (the
  * default budgets sit above testdata sizes); these specs force the
  * SAMPLED path with a tiny budget and pin its contracts —
  * determinism, in-band flagging, estimator sanity — plus the plan
  * shape that proves the t_postings agg buffer is bounded.
  */
class ScaleGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("a58_theilsen sampled path: deterministic, flagged, sane") {
    val full = queries.Curation18Q.theilSen(spark, dir, 1000000L)
      .select("user_id", "n_pairs", "ts_slope", "sampled").cache()
    val fullRows = full.collect()
    assert(fullRows.nonEmpty && fullRows.forall(!_.getBoolean(3)),
      "default budget must not sample at testdata scale")

    val s1 = queries.Curation18Q.theilSen(spark, dir, 20L)
      .select("user_id", "n_pairs", "ts_slope", "sampled").cache()
    val r1 = s1.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    val r2 = queries.Curation18Q.theilSen(spark, dir, 20L)
      .select("user_id", "n_pairs", "ts_slope", "sampled")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    assert(r1.sameElements(r2), "hash-sampling must be deterministic")

    val fullPairs = fullRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampledUsers = r1.filter(_._4)
    assert(sampledUsers.nonEmpty, "tiny budget must trigger sampling")
    sampledUsers.foreach { case (uid, nP, slope, _) =>
      assert(nP < fullPairs(uid),
        s"user $uid: sampled n_pairs $nP must shrink from ${fullPairs(uid)}")
      assert(!slope.isNaN && !slope.isInfinite)
    }
  }

  test("a56_kendall sampled path: flagged and tau stays in [-1,1]") {
    val s1 = queries.Curation17Q.kendall(spark, dir, 20L)
      .select("user_id", "n_pairs", "conc", "disc", "tau_a", "sampled")
      .collect()
    assert(s1.exists(_.getBoolean(5)), "tiny budget must trigger sampling")
    s1.foreach { r =>
      val (n, c, d, tau) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(c + d <= n, "concordant+discordant bounded by sampled pairs")
      assert(tau >= -1.0 && tau <= 1.0, s"tau $tau out of range")
    }
  }

  test("t_postings: rank filter sits below the collect aggregate") {
    val df = SparkEntry.queries("t_postings")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val aggAt = plan.indexOf("collect_list")
    val filtAt = plan.indexOf("<= 50")
    assert(aggAt >= 0 && filtAt >= 0, s"missing nodes in plan:\n$plan")
    // executedPlan prints top-down: the rn<=50 filter printing AFTER
    // the aggregate line means it executes BELOW it — at most 50
    // structs ever enter the agg buffer, stopword terms included.
    assert(filtAt > aggAt, "rn<=50 must execute below the collect agg")
    // df still carries the TRUE document frequency (no silent cap):
    // every df value must equal the term's full posting count.
    val row = df.agg(max("df"), max(size(split(col("postings"), " "))))
      .collect()(0)
    assert(row.getLong(0) >= row.getInt(1),
      "df reports totals, postings list is the capped prefix")
  }
}
