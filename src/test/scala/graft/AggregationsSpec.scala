package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregations
import graft.queries.Q
import graft.ml.SequenceScorer
import graft.pipeline.SequenceFeaturePipeline

/** Generic A2/A3/A4 helpers and the M8 frozen-scorer boundary. */
class AggregationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0, 2.0), ("a", 3.0, 2.0), ("a", Double.NaN, 4.0),
    ("b", 10.0, 1.0)).toDF("k", "v", "w")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))

  test("A2 multiAgg: named outputs incl. pre-multiplied weighted mean") {
    val r = Aggregations.multiAgg(df, Seq("k"), Seq(
      "n" -> count(lit(1)),
      "v_sum" -> sum("v"),
      "w_mean_v" -> (sum(col("v") * col("w")) / sum(when(col("v").isNotNull, col("w")))),
      "v_min" -> min("v"))).orderBy("k").collect()
    assert(r(0).getAs[Long]("n") == 3)
    assert(approx(r(0).getAs[Double]("v_sum"), 4.0))
    assert(approx(r(0).getAs[Double]("w_mean_v"), (1.0 * 2 + 3 * 2) / 4))
    assert(approx(r(1).getAs[Double]("v_min"), 10.0))
  }

  test("A3 groupedTransform: stats broadcast to rows, one per suffix") {
    val r = Aggregations.groupedTransform(df, Seq("k"), Seq("v"))
    assert(r.columns.count(_.startsWith("v_")) == 4)
    val a = r.filter(col("k") === "a").select("v_mean", "v_min", "v_max").head()
    assert(approx(a.getDouble(0), 2.0) && a.getDouble(1) == 1.0 && a.getDouble(2) == 3.0)
    // single-row group: std is null (ddof=1)
    assert(r.filter(col("k") === "b").select("v_std").head().isNullAt(0))
  }

  test("A4 imputeGroupMean: nulls get group mean; fallback for all-null groups") {
    val d2 = Seq(("a", Some(1.0)), ("a", None), ("c", None))
      .toDF("k", "v")
    val r = Aggregations.imputeGroupMean(d2, Seq("k"), Seq("v"), fallback = Some(-1.0))
      .orderBy("k").select("v").collect()
    assert(r(0).getDouble(0) == 1.0 && r(1).getDouble(0) == 1.0)
    assert(r(2).getDouble(0) == -1.0)
  }

  test("M8 scorer: frozen linear read-out over sequence tensors, map-side") {
    val frames = (1 to 10).map(f => (1L, 1L, f.toLong, 7L,
      f.toDouble, 2.0 * f, 1.0, 90.0, "Offense"))
      .toDF("game_id", "play_id", "frame_id", "nfl_id",
        "x", "y", "s", "dir", "player_side")
    val seqs = SequenceFeaturePipeline.build(frames, window = 4)
    val nF = SequenceFeaturePipeline.SeqFeatures.length
    val m = SequenceScorer.LinearSeqModel(
      window = 4, features = SequenceFeaturePipeline.SeqFeatures,
      weightsX = Array.fill(4 * nF)(0.1), weightsY = Array.fill(4 * nF)(-0.1),
      biasX = 5.0, biasY = 5.0)
    val out = SequenceScorer.score(seqs, "seq", m).select("nn_x", "nn_y").head()
    assert(!out.isNullAt(0) && !out.isNullAt(1))
    assert(approx(out.getDouble(0) - 5.0, -(out.getDouble(1) - 5.0), 1e-9))
  }

  test("madOutliers: one row per input row, null group included; flags correct") {
    import graft.operators.Aggregations
    val df = Seq(
      (Some("g"), 1L, 10.0), (Some("g"), 2L, 11.0), (Some("g"), 3L, 10.5),
      (Some("g"), 4L, 99.0),                      // far outlier
      (Option.empty[String], 5L, 1.0), (Option.empty[String], 6L, 2.0)
    ).toDF("grp", "id", "v")
    val r = Aggregations.madOutliers(df, Seq("grp"), Seq("id"), "v", k = 3.0)
    assert(r.count() == 6, "null-group rows must survive the stats joins")
    val flags = r.collect().map(x => x.getLong(1) -> x.getBoolean(4)).toMap
    assert(flags(4L), "the 99.0 point must flag")
    assert(!flags(1L) && !flags(5L) && !flags(6L))
  }

  test("a25 exact-integer 3-sigma flag == double z-score, off-boundary") {
    val rows = SparkEntry.queries("a25_outliers")(spark, "/root/testdata/sf0.001")
      .select("event_type", "cents", "is_outlier").collect()
    assert(rows.nonEmpty && rows.exists(_.getBoolean(2)),
      "some event values must flag at 3 sigma (heavy-tailed column)")
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      val xs = grp.map(_.getLong(1).toDouble)
      val n = xs.length
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      grp.foreach { r =>
        val z = math.abs(r.getLong(1) - mean) / sd
        if (math.abs(z - 3.0) > 1e-9)
          assert(r.getBoolean(2) == (z > 3.0),
            s"flag disagrees with double z=$z in ${r.getString(0)}")
      }
    }
  }

  test("a26 grouped skewness/kurtosis match a direct double computation") {
    val got = SparkEntry.queries("a26_moments")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val cents = Q.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    cents.groupBy(_._1).foreach { case (grp, vs) =>
      val xs = vs.map(_._2)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      def cm(p: Int) = xs.map(v => math.pow(v - mean, p)).sum / n
      val (gn, skew, kurt) = got(grp)
      assert(gn == xs.length)
      assert(approx(skew, cm(3) / math.pow(cm(2), 1.5), 1e-5), s"skew $grp")
      assert(approx(kurt, cm(4) / (cm(2) * cm(2)) - 3.0, 1e-5), s"kurt $grp")
    }
  }
}
