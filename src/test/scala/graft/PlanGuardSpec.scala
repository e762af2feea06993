package graft

import graft.tools.PlanAudit

/** CI gate over every registered query's physical plan: the
  * scale-killing shapes (cartesian products, single-partition
  * windows) can never silently regress, and broadcast nested-loop
  * joins stay confined to the documented tiny-frame exceptions.
  *
  * A failure here means either (a) a new query planned a shape that
  * does not survive 100 TB — fix the plan (DistRank for global
  * ranks, broadcast/equi-join for cartesians), or (b) a new
  * INTENTIONAL bounded-frame exception — add it to the allow-list
  * below WITH a justification comment.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed to plan a window with an empty partition spec:
    * each one's input frame is bounded by CONSTRUCTION (a fixed
    * lattice/domain), not by the data volume, so the one-task sort
    * touches O(domain) rows at any scale. */
  private val globalWindowAllowed = Set(
    // per-day survival curve: the day lattice is the output grain,
    // and the survival product is an IEEE-ordered fold that a
    // distributed regroup would change bitwise
    "a60_kaplan_meier",
    // BH ranks its p-values over the EVENT-TYPE domain (5 rows by
    // construction); the step-up scan is the same bounded frame
    "a81_bh_fdr",
    // Nelson-Aalen shares a60's justification: the frame is the
    // bounded-by-construction day lattice, and the cumulative-hazard
    // fold is an IEEE-ordered sum a distributed regroup would change
    "a75_nelson_aalen",
    // bottom-k sketch MERGE: at most 64 rows per scope survive the
    // per-scope (partitioned) stage; the constant-scope merge frame
    // is <= 64 * |scopes|
    "a62_bottomk_quantiles",
    // the closed-form isotonic twin is BY DESIGN an O(m^3) exact
    // oracle over a <= 101-value score lattice (score = id % 101);
    // the scale path is MLlib PAV in m25_isotonic
    "m25_isotonic_closed",
    // top-20 BPE merge candidates over char-bigram counts: the pair
    // domain is bounded by the alphabet squared (<= ~27^2 rows)
    "t_bpe_learn",
    // DeLong's placement moments aggregate per SCORE GROUP on the
    // 101-value lattice (the m15/a70 fixture) — bounded domain
    "m41_delong",
    // autocorrelation peak over a FIXED 48-lag frame
    "w64_period_detect",
    // log-rank at-risk counts: reverse cumsum over the a60-style
    // bounded day lattice (duration days, ≤ data span by construction)
    "a85_logrank",
    // DistRank parts=1 fast path on the 5-row per-type aggregate:
    // the constant-bucket window is the documented aggregate-grain
    // single-bucket plan (structurally guarded in DistRank)
    "m43_conformal",
    // same parts=1 fast path: categorical label counts (m18) and the
    // distinct dimension-pair key frame (o12) — both aggregate-grain
    "m18_stringindex", "o12_surrogate",
    // batch 70: the daily-revenue series is a bounded CALENDAR-SPAN
    // lattice (the a60_kaplan_meier class) — its ordered windows
    // (PACF lags, MACD recursions, Aroon frames) touch O(days) rows
    // at any data scale
    "w78_pacf", "w79_macd", "w80_aroon",
    // batch 71: same bounded day-lattice series (OHLC grain)
    "w81_atr", "w82_granger", "w83_stochastic",
    // batch 77: the 101-value score lattice (m64) and the day
    // lattice (w86) — both bounded by domain
    "m64_ks_stat", "w86_drawdown",
    // round 10: the m25 gate embeds the closed twin's bounded
    // <=101-score lattice window (same justification as
    // m25_isotonic_closed)
    "m25_isotonic_gate")

  /** Queries allowed to plan a BroadcastNestedLoopJoin: every entry
    * is an intentional crossJoin(broadcast(x)) of a scalar/parameter
    * frame (grand totals, fitted cut points, centroids, thresholds)
    * or a documented bounded recall-oracle. */
  private val bnlAllowed = Set(
    "a17_binning", "a24_constraints", "a27_psi", "a28_benford",
    "a34_cms", "a41_jsd", "a48_cuped", "c_curation", "d_dupstats",
    "d_embdup", "e2_seqfeatures", "j19_entity_res", "j24_bitemporal",
    "m11_pmi", "m12_chisq", "m15_cooccur", "m19_rfm", "m20_infogain",
    // m34: the same ivfAssign centroid crossJoin-of-broadcast(K=sqrt N)
    // as s_knn_join — the documented IVF blocking pass
    "m34_knn_clf",
    // m36: the 5-row class parameter frame fans out each test doc —
    // an intentional broadcast of the (class, prior, denominator) table
    "m36_nb_clf",
    // m37: the same ivfAssign centroid broadcast as s_knn_join/m34
    "m37_retrieval_eval",
    "m25_isotonic_closed", "m28_best_f1", "m4_residual", "m6_scaler",
    // round 10: the m25 gate embeds the closed twin's bounded-lattice
    // theta-join (<=101 rows by construction)
    "m25_isotonic_gate",
    "m8_scorer", "o23_timetravel", "s_ivf_recall", "s_ivf_topk",
    // s_two_stage: the 5-row query parameter frame fans out for the
    // brute-force recall oracle (the s_ivf_recall class)
    "s_two_stage",
    // s_rrf: the 1-ROW query-vector parameter frame broadcasts; the
    // constant-key equi-join folds to a BNL of one row by design
    "s_rrf",
    "s_knn_join", "t_bigram_rare", "t_bpe_merges",
    // t_textrank: m15_cooccur's 1-row corpus-size scalar crossJoin
    // feeding the relative df cap
    "t_textrank",
    "t_ccnet_buckets", "t_dsir", "t_heaps", "t_keyphrase", "t_mixture",
    "t_stopword_discovery", "t_tfidf", "t_time_split", "t_unigram_lp",
    "t_upsample", "w62_ewma_chart", "w64_period_detect",
    // batch 42-44 scalar-parameter crossJoins: the tie/total/support
    // one-row aggregates broadcast into the final single-row compute
    "a84_kruskal_wallis", "a87_friedman", "a88_wasserstein",
    "a89_cochran_q",
    // m49: the 1-row OLS scalar frame (slope/intercept/s²) broadcasts
    // into the per-row influence map
    "m49_cooks",
    // m30: the 1-row transaction-count scalar frame broadcasts into
    // the pair-support threshold + lift (round 10: replaced the
    // build-time .count() so plan construction is action-free)
    "m30_assoc_rules",
    // g20: the 11-row literal k-ladder joins the bounded degree
    // histograms on an inequality — broadcast of a constant frame
    "g20_richclub",
    // a91: the (n, sx) scalar totals and num0 one-row frames
    // broadcast into the bounded 24-lag compute
    "a91_ljungbox",
    // a100/a101: the 1-row mean-anchor / median / totals frames
    // broadcast into the row-scale moment pass and the 3-row table
    "a100_jarque_bera", "a101_mood_median",
    // m51: the 1-row nvec/ssw scalar frames broadcast into the
    // 64-row per-dim moment combine
    "m51_calinski",
    // a102/a103: the 1-row adjacent-pair aggregate broadcasts into
    // the 1-row denominator combine, and (round 11) DistRank
    // .adjacentPairs chains the ≤ p-row bucket-end frames over a
    // broadcast next-present-bucket inequality
    "a102_chatterjee_xi", "a103_bartels_rvn",
    // g21: the per-round 1-row max-renormalizer broadcasts into the
    // node-score frame; w71: the 1-row global-moment frame broadcasts
    // into the per-day subgroup table
    "g21_eigencentrality", "w71_xbar_chart",
    // a105: the 1-row k / n_blocks scalar frames broadcast into the
    // completeness filter and the final single-row compute (the a87
    // Friedman shape)
    "a105_page_trend",
    // a92: the one-row (n) total crossJoins into the hour lattice;
    // m44: the 5-row marginal frames crossJoin into the 25-cell
    // expected-agreement sum — all bounded parameter frames
    "a92_changepoint", "m44_qwk",
    // m45: the 50-row LCG draw-pair parameter frame broadcasts into
    // the hour-lattice inlier count
    "m45_ransac",
    // m46: cell-pair concordance — both sides of the crossJoin are
    // the bounded (day × event × riskband ≤ ~1300 rows) lattice;
    // a94: the one-row B total broadcasts into the final row
    "m46_cindex", "a94_fleiss_kappa",
    // batch 59-67 parameter frames: a107's two 1-row entropy frames;
    // a108's inequality join of the bounded 5×4 contingency grid with
    // itself; m54's cumulative self-join of the 10-row decile table;
    // a113's 1-row day-bounds frame into the day-grain series; m57's
    // 1-row good/bad totals; a111's 1-row theta/exact frames; j26's
    // 1-row blocking-stats frame (the j19 shape); s_hard_negatives'
    // ivfAssign centroid broadcast (the s_knn_join class)
    "a107_theil_u", "a108_gk_gamma", "m54_qini", "a113_chow",
    "m57_woe_iv", "a111_theta_sketch", "j26_jw_entity",
    "s_hard_negatives",
    // a115: a108's inequality join of the bounded 5×4 grid with
    // itself plus three 1-row margin frames
    "a115_somers_d",
    // w78: the 1-row (n, total) frame broadcasts into the bounded
    // day-lattice series (the a113_chow shape)
    "w78_pacf",
    // g23: three 1-row scalar frames (start node, far node, sweep-2
    // extent) combine into the single output row; m60: the 1-row
    // moment frame broadcasts into the per-row distance map (the
    // m49_cooks shape)
    "g23_pseudo_diameter", "m60_mahalanobis",
    // j27: j26's 1-row blocking-stats frame; d_bloom_handshake: the
    // 4-row shard parameter frame fans each doc out to its 3 peers
    "j27_dl_entity", "d_bloom_handshake",
    // m58: fifteen 1-row entropy frames combine into the 4-row
    // feature ladder (the a107 shape, one frame per margin)
    "m58_mrmr",
    // a121: the a108-style inequality join of the bounded 7×50 grid
    // with itself plus two 1-row moment frames
    "a121_jonckheere",
    // m64: the 1-row argmax frame re-enters the 101-row lattice
    "m64_ks_stat")

  test("no cartesian, no unlisted global window or BNL, all plans build") {
    // the window detector needs the static plan; restore AQE after
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val flags =
          try PlanAudit.audit(fn(spark, dir))
          catch { case e: Throwable =>
            failures += s"$name: plan build failed: " +
              s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(120)
            PlanAudit.Flags(cartesian = false, bnl = false,
              globalWindow = false, exchanges = 0)
          }
        if (flags.cartesian)
          failures += s"$name: CartesianProduct (never allowed)"
        if (flags.globalWindow && !globalWindowAllowed(name))
          failures += s"$name: single-partition window not in allow-list"
        if (flags.bnl && !bnlAllowed(name))
          failures += s"$name: BroadcastNestedLoopJoin not in allow-list"
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
