package graft

import org.apache.spark.graftshim.ListenerBusBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** CI gate: constructing a registered query's plan must not run
  * Spark jobs. A build-time action (`.count()`, `.collect()`, an
  * eager MLlib fit) executes at PLAN time — before any caller decides
  * partitioning, limits, or whether to run the query at all — and at
  * 100 TB that is an unbounded hidden scan. PlanGuardSpec audits the
  * plan SHAPE; this spec audits plan-build SIDE EFFECTS (the
  * m30_assoc_rules round-10 fix class, which PlanGuard cannot see).
  *
  * Job attribution uses the thread-local job group: construction
  * happens on this suite's thread, so only jobs submitted
  * synchronously during build carry the `graft-build:` group. The
  * listener bus is drained via the private-API bridge before
  * asserting, so the count is deterministic, not racy.
  */
class BuildActionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose construction INTENTIONALLY runs jobs — five
    * classes, every one a documented multi-pass or materializing
    * operator. Anything NOT listed must build with ZERO jobs; add an
    * entry only with its class (or a new written justification).
    *
    * (a) DistRank metadata passes: the distributed-rank operator
    *     freezes range boundaries (approx-percentile sketch) and
    *     collects ≤ shuffle-partitions rows of bucket totals at
    *     build — bounded metadata, never row-scale (DistRank.scala).
    * (b) Eager fits / iterative driver loops: the model or fixpoint
    *     IS the query — MLlib GBT/isotonic/FP-Growth, Lloyd steps,
    *     power iteration, IPF raking, greedy MMR/k-center/mRMR,
    *     AdaBoost rounds, Holt-Winters/DTW/Markov packed-fold params,
    *     median polish. Each iteration is a distributed pass; only
    *     O(params) lands on the driver.
    * (c) Graph/closure frontier loops: Pregel-shape iterate-until-
    *     fixpoint (PageRank, k-core, k-truss, components, PPR,
    *     harmonic, pseudo-diameter, TextRank) with a driver-side
    *     convergence check (1-row collect per round).
    * (d) IO round-trips: the sink is the operator under test — the
    *     query writes files then reads them back (s1/s6–s20 csv,
    *     jsonl, orc, text, xml, zstd, bucketed, partitioned,
    *     merge-schema, bloom, dynamic-overwrite, s5 model artifacts).
    * (e) Structured-streaming batch-parity harnesses: a bounded
    *     memory-source stream must RUN its micro-batches to emit the
    *     sink table the query returns.
    * Plus bounded driver collects feeding literal/broadcast frames
    * (centroids, cut points, corpus scalars) — aggregate-grain or
    * capped by construction, never row-scale. */
  private val buildJobsAllowed: Set[String] = Set(
    // (a) DistRank rank/quantile/cumsum metadata passes
    "a101_mood_median", "a102_chatterjee_xi", "a103_bartels_rvn",
    "a104_kuiper", "a17_binning", "a35_ks", "a74_quantile_norm",
    "a76_cvm", "a84_kruskal_wallis", "a88_wasserstein",
    "a92_changepoint", "m14_auc", "m16_gains", "m19_rfm", "m1_folds",
    "m28_best_f1", "m33_prequential", "m40_shapley", "m43_conformal",
    "m53_pr_auc", "m54_qini", "o20_wap", "o24_skew_audit",
    "o32_skyline", "o33_overlap_depth", "t_pps_sample", "t_vocab",
    "t_zipf_slope", "t_burstiness",
    // (b) eager fits / iterative driver loops
    "e1_rmse_gate", "e1_tree_ensemble", "m2_gbt", "m2_rmse_gate",
    "m25_isotonic", "m25_isotonic_gate", "m26_fpgrowth",
    "m27_perm_importance", "m29_gbt_importance", "m36_nb_clf",
    "m38_adaboost", "m39_learning_curve", "m42_replay_eval",
    "m45_ransac", "m47_pca", "m50_davies_bouldin", "m51_calinski",
    "m52_silhouette", "m58_mrmr", "m5_ridge", "m5_ridge_closed",
    "m61_dbscan_grid", "m8_nn_gate", "s_kcenter", "s_kmeans_ivf",
    "s_mmr", "t_quality_clf", "a90_raking", "a95_entropy_rate",
    "a122_median_polish", "w66_dtw", "w68_markov_stationary",
    "w72_holt_winters",
    // (b/bounded collects) IVF centroid / scalar parameter frames
    "s_brute_topk", "s_ivf_recall", "s_ivf_topk", "s_rrf",
    "v_proj_recall", "t_bm25", "t_ccnet_buckets", "t_kneser_ney",
    "t_kwic", "t_llr", "j16_bloom",
    // (c) graph/closure frontier loops
    "c_curation", "d_components", "d_embclusters", "g10_ppr",
    "g13_modularity", "g16_ktruss", "g17_harmonic", "g19_bipartite",
    "g21_eigencentrality", "g23_pseudo_diameter", "g5_kcore",
    "g_pagerank", "t_textrank",
    // (d) IO round-trips (the sink is the operator under test)
    "s10_bucketed", "s11_text", "s12_xml", "s13_binaryfile",
    "s14_badrecords", "s15_recursive", "s16_zstd", "s17_wholetext",
    "s18_multiline_csv", "s19_parquet_bloom", "s1_csv_roundtrip",
    "s20_dynamic_overwrite", "s5_artifacts", "s5_roundtrip_gate",
    "s6_jsonl", "s7_partitioned", "s8_orc", "s9_mergeschema",
    // (e) streaming batch-parity harnesses
    "w10_stream_ema", "w11_stream_roll", "w12_stream_window",
    "w14_stream_join", "w15_stream_dedup", "w18_stream_enrich",
    "w19_stateful_v2", "w29_stream_cusum", "w36_stream_topk",
    "w37_stream_session", "w38_stream_typecounts", "w50_stream_timer",
    "w56_stream_update", "w59_stream_attribution",
    "w60_stream_left_join", "w70_stream_hll", "w76_stream_kalman",
    "w85_stream_ph")

  test("plan construction fires no Spark jobs outside the allow-list") {
    val sc = spark.sparkContext
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null && g.startsWith("graft-build:")) {
          val q = g.stripPrefix("graft-build:")
          counts.merge(q, 1, (a: Int, b: Int) => a + b)
        }
      }
    }
    // warm Tables' schema cache OUTSIDE the measured groups: the
    // first read per path runs the one-task parquet footer-inference
    // job by design (the catalog stands in for it on a cluster)
    graft.io.Tables.names.foreach(graft.io.Tables.load(spark, dir, _))
    sc.addSparkListener(listener)
    try {
      val buildFailures = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        sc.setJobGroup(s"graft-build:$name", s"build $name")
        try fn(spark, dir)
        catch { case e: Throwable =>
          buildFailures += s"$name: ${e.getClass.getSimpleName}"
        } finally sc.clearJobGroup()
      }
      ListenerBusBridge.waitUntilEmpty(sc)
      assert(buildFailures.isEmpty, buildFailures.mkString("\n"))
      import scala.jdk.CollectionConverters._
      val offenders = counts.asScala.toSeq
        .filterNot { case (q, _) => buildJobsAllowed(q) }
        .sortBy(_._1)
        .map { case (q, n) => s"$q: $n job(s) during plan construction" }
      assert(offenders.isEmpty,
        "hidden build-time actions (add to allow-list ONLY with a " +
          "written justification):\n" + offenders.mkString("\n"))
    } finally sc.removeSparkListener(listener)
  }
}
