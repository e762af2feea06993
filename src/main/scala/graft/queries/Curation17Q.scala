package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Round-5 batch 17: Kendall rank correlation and association-rule
  * mining. Net-new vs the reference (SURVEY.md §2.11). Kendall's
  * concordant/discordant counts are exact BIGINTs from a bounded
  * within-group pair join; rule confidence is one division of exact
  * support counts.
  */
object Curation17Q {

  /** Shared per-group pair budget for a56_kendall / a58_theilsen —
    * ONE constant feeds both the Spark sampling rule and the oracle
    * SQL's `sampled` expression so the two cannot drift. Divergence
    * threshold: a group samples once n·(n−1)/2 > budget, i.e. at
    * n ≥ 1415 observations for 10⁶ — the DuckDB oracle always
    * enumerates ALL pairs (it has no xxhash64), so n_pairs/tau/slope
    * intentionally diverge for such groups and the gate relies on
    * every testdata SF staying below the threshold (sf1's max user
    * group is ~600 events; a larger SF must raise the budget or
    * accept rows-only checks on these two).
    */
  val PairBudget = 1000000L

  val queries: Map[String, QueryFn] = Map(

    // Kendall's tau-a per user (value vs time): concordant minus
    // discordant pairs over n(n−1)/2 — the third rank-correlation
    // lens (Pearson a18 linear, Spearman a46 monotone, Kendall pure
    // pair order; it reacts differently to ties and outliers). The
    // pair join is WITHIN-group (i<j on the time rank); groups whose
    // full pair count exceeds maxPairs are deterministically
    // downsampled (same xxhash64 millionth-lattice rule as
    // a58_theilsen) with the `sampled` flag in-band — tau over a
    // uniform pair sample is the standard unbiased estimator. The
    // default budget sits far above testdata sizes, so the oracle
    // (always exhaustive) matches.
    "a56_kendall" -> ((s, dir) => kendall(s, dir, PairBudget)),

    // Association rules (1→1) over the m26 order baskets: confidence
    // = support(a,b)/support(a), lift·10⁶ kept on the integer lattice
    // via cross-multiplied counts. The actionable layer on top of
    // frequent itemsets — emitted only for pairs above the same
    // ceil(0.01·n) support threshold, rules with confidence ≥ 0.1
    // (integer cross-product decision).
    "m30_assoc_rules" -> ((s, dir) => {
      val ob = lineitem(s, dir)
        .join(part(s, dir).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")).distinct()
        .cache()
      // transaction count as a broadcast SCALAR FRAME, not a
      // build-time .count(): keeps plan construction action-free
      // (PlanGuardSpec and repeated bench builds paid a hidden job
      // here through round 9). Threshold math stays in double —
      // ceil(0.01·n) — to preserve the original tie behavior.
      val ntx = ob.agg(countDistinct("l_orderkey").as("n_tx"))
      val singles = ob.groupBy("p_brand").agg(count(lit(1)).as("fa"))
      val pairs = ob.select(col("l_orderkey"), col("p_brand").as("ba"))
        .join(ob.select(col("l_orderkey"), col("p_brand").as("bb")),
          "l_orderkey")
        .filter(col("ba") =!= col("bb"))
        .groupBy("ba", "bb").agg(count(lit(1)).as("fab"))
        .crossJoin(broadcast(ntx))
        .filter(col("fab") >=
          ceil(lit(0.01) * col("n_tx")).cast("long"))
      pairs
        .join(singles.select(col("p_brand").as("ba"), col("fa")), "ba")
        .join(singles.select(col("p_brand").as("bb"),
          col("fa").as("fb")), "bb")
        .filter(col("fab") * 10 >= col("fa")) // confidence >= 0.1
        .select(col("ba").as("antecedent"), col("bb").as("consequent"),
          col("fab"), col("fa"), col("fb"),
          (col("fab").cast("double") / col("fa")).as("confidence"),
          expr("fab * n_tx * 1000000 DIV (fa * fb)").as("lift_ppm"))
    }))

  val queries2: Map[String, QueryFn] = Map(

    // KMV (k-minimum-values) distinct-count sketch: hash every key
    // onto the polynomial lattice, keep the k=64 smallest per group,
    // estimate distinct = (k−1)·P DIV h_k — the order-statistics
    // alternative to HLL (a11/a30), mergeable by keeping the k
    // smallest of a union. Everything is integer (deterministic
    // hash, window rank, one integer DIV), so unlike HLL the sketch
    // itself is engine-exact; the accuracy gate is the a30-style
    // integer-decided ±25% band vs the exact count.
    "a57_kmv" -> ((s, dir) => {
      val P = graft.functions.Text.P
      val h = pmod(col("l_partkey") * 2654435761L + 104729L, lit(P))
      val keys = lineitem(s, dir)
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .select(col("l_returnflag"), col("l_partkey"), h.as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("h"), col("l_partkey"))
      val kth = keys.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 64)
        .select(col("l_returnflag"), col("h").as("hk"))
      val exact = keys.groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("exact_nd"))
      exact.join(kth, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("exact_nd"),
          when(col("hk").isNotNull, expr(s"63 * ${P}L DIV hk"))
            .otherwise(col("exact_nd")).as("kmv_est"))
        .withColumn("within_25pct",
          col("kmv_est") * 4 >= col("exact_nd") * 3 &&
            col("kmv_est") * 4 <= col("exact_nd") * 5)
    }))

  /** Kendall tau-a core with an explicit per-group pair budget —
    * the a58_theilsen sampling rule: pairs in groups whose total
    * n·(n−1)/2 exceeds maxPairs survive iff
    * xxhash64(user, ia, ib) mod 10⁶ < (maxPairs·10⁶) DIV total,
    * deterministic across runs/partitionings; n_pairs then counts
    * the SAMPLED pairs (tau's denominator) and sampled=true rides
    * the output row (no silent caps).
    */
  def kendall(s: org.apache.spark.sql.SparkSession, dir: String,
      maxPairs: Long): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
    val e = graft.io.Tables.eventsUs(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n_obs", count(lit(1)).over(wu))
    val a = e.select(col("user_id"), col("n_obs"),
      col("i").as("ia"), col("c").as("ca"))
    val b = e.select(col("user_id"), col("i").as("ib"), col("c").as("cb"))
    val pairs = a.join(b, "user_id").filter(col("ib") > col("ia"))
      .withColumn("tot_pairs", expr("(n_obs * (n_obs - 1)) DIV 2"))
      .withColumn("sampled", col("tot_pairs") > maxPairs)
      .filter(!col("sampled") ||
        pmod(xxhash64(col("user_id"), col("ia"), col("ib")),
          lit(1000000L)) < expr(s"(${maxPairs}L * 1000000) DIV tot_pairs"))
    val g = pairs.groupBy("user_id").agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("cb") > col("ca"), 1L).otherwise(0L)).as("conc"),
      sum(when(col("cb") < col("ca"), 1L).otherwise(0L)).as("disc"),
      max("sampled").as("sampled"))
    g.select(col("user_id"), col("n_pairs"), col("conc"), col("disc"),
      ((col("conc") - col("disc")).cast("double") / col("n_pairs"))
        .as("tau_a"), col("sampled"))
  }

  // ---- oracle SQL ----------------------------------------------------

  val oracle: Map[String, String] = Map(

    // Oracle is ALWAYS exhaustive: valid only while every group sits
    // under PairBudget pairs (n < 1415 obs) — see PairBudget doc.
    "a56_kendall" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |r AS (SELECT user_id, c,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    ::BIGINT AS i
        | FROM e),
        |p AS (SELECT a.user_id, a.c AS ca, b.c AS cb
        | FROM r a JOIN r b ON b.user_id = a.user_id AND b.i > a.i),
        |g AS (SELECT user_id, count(*)::BIGINT AS n_pairs,
        |  sum(CASE WHEN cb > ca THEN 1 ELSE 0 END)::BIGINT AS conc,
        |  sum(CASE WHEN cb < ca THEN 1 ELSE 0 END)::BIGINT AS disc
        | FROM p GROUP BY user_id)
        |SELECT user_id, n_pairs, conc, disc,
        | (conc - disc)::DOUBLE / n_pairs AS tau_a,
        | n_pairs > $PairBudget AS sampled
        |FROM g""".stripMargin,

    "a57_kmv" -> {
      val P = graft.functions.Text.P
      s"""WITH keys AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
         |hh AS (SELECT l_returnflag, l_partkey,
         |  (l_partkey * 2654435761 + 104729) % $P AS h FROM keys),
         |r AS (SELECT l_returnflag, h,
         |  row_number() OVER (PARTITION BY l_returnflag
         |    ORDER BY h, l_partkey) AS rk FROM hh),
         |k AS (SELECT l_returnflag, h AS hk FROM r WHERE rk = 64),
         |e AS (SELECT l_returnflag,
         |  count(DISTINCT l_partkey)::BIGINT AS exact_nd
         | FROM keys GROUP BY 1),
         |j AS (SELECT e.l_returnflag, exact_nd,
         |  (CASE WHEN hk IS NOT NULL THEN 63::BIGINT * $P // hk
         |        ELSE exact_nd END)::BIGINT AS kmv_est
         | FROM e LEFT JOIN k USING (l_returnflag))
         |SELECT l_returnflag, exact_nd, kmv_est,
         | kmv_est * 4 >= exact_nd * 3 AND kmv_est * 4 <= exact_nd * 5
         |   AS within_25pct
         |FROM j""".stripMargin
    },

    "m30_assoc_rules" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
        | FROM lineitem JOIN part ON p_partkey = l_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS nt FROM ob),
        |th AS (SELECT CAST(ceil(0.01 * nt) AS BIGINT) AS minc, nt FROM n),
        |s AS (SELECT p_brand, count(*)::BIGINT AS fa FROM ob GROUP BY 1),
        |pr AS (SELECT a.p_brand AS ba, b.p_brand AS bb,
        |  count(*)::BIGINT AS fab
        | FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
        |   AND a.p_brand != b.p_brand
        | GROUP BY 1, 2),
        |k AS (SELECT ba, bb, fab FROM pr, th WHERE fab >= minc)
        |SELECT ba AS antecedent, bb AS consequent, fab,
        | sa.fa AS fa, sb.fa AS fb,
        | fab::DOUBLE / sa.fa AS confidence,
        | fab * th.nt * 1000000 // (sa.fa * sb.fa) AS lift_ppm
        |FROM k JOIN s sa ON sa.p_brand = k.ba
        | JOIN s sb ON sb.p_brand = k.bb
        | CROSS JOIN th
        |WHERE fab * 10 >= sa.fa""".stripMargin)
}
