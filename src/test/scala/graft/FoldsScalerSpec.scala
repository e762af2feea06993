package graft

import org.apache.spark.sql.functions._
import graft.ml.{Folds, Scaler}

/** Fold assignment invariants (group-disjoint, full coverage,
  * determinism) and the column-algebra standard scaler. */
class FoldsScalerSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 300).map(i => (s"g${i % 37}", i)).toDF("grp", "v")

  test("hashFold: deterministic, group-disjoint, in range") {
    val f = Folds.withFold(df, Seq("grp"), 5)
    assert(f.filter(col("fold") < 0 || col("fold") >= 5).count() == 0)
    val perGroup = f.groupBy("grp").agg(countDistinct("fold").as("n"))
    assert(perGroup.filter(col("n") =!= 1).count() == 0)
    val again = Folds.withFold(df, Seq("grp"), 5)
    assert(f.select("grp", "fold").except(again.select("grp", "fold")).count() == 0)
  }

  test("withRankFold: group-disjoint, covers all k folds, balanced") {
    val f = Folds.withRankFold(df, Seq("grp"), 5)
    val perGroup = f.groupBy("grp").agg(countDistinct("fold").as("n"))
    assert(perGroup.filter(col("n") =!= 1).count() == 0)
    val folds = f.select("fold").distinct().as[Int].collect().sorted
    assert(folds.toList == List(0, 1, 2, 3, 4))
    // 37 groups over 5 folds: sizes 7 or 8
    val sizes = f.select("grp", "fold").distinct()
      .groupBy("fold").count().select("count").as[Long].collect()
    assert(sizes.forall(s => s == 7 || s == 8))
  }

  test("scaler: output has mean ~0 and sample std ~1") {
    val d = (1 to 100).map(i => i.toDouble).toDF("x")
    val s = Scaler.fitTransform(d, Seq("x"))
    val r = s.agg(avg("x_scaled"), stddev_samp("x_scaled")).head()
    assert(approx(r.getDouble(0), 0.0, 1e-9))
    assert(approx(r.getDouble(1), 1.0, 1e-9))
  }

  test("scaler: constant column yields null (undefined scale), not garbage") {
    val d = Seq(1.0, 1.0, 1.0).toDF("x")
    val s = Scaler.fitTransform(d, Seq("x"))
    assert(s.filter(col("x_scaled").isNotNull).count() == 0)
  }
}
