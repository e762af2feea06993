package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregations

/** Goldens for the exact quantile discretizer and the integer-exact
  * correlation matrix (operators/Aggregations.scala).
  */
class DiscretizerCorrSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantileCuts: discrete lower-quantile semantics (actual data values)") {
    // 8 values → quartile ranks ceil(8·{1,2,3}/4) = {2,4,6}
    val df = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0).toDF("x")
    val cuts = Aggregations.exactQuantileCuts(df, col("x"), Seq(1, 2, 3), 4)
      .as[(Double, Double, Double)].head()
    assert(cuts == ((20.0, 40.0, 60.0)))
  }

  test("exactQuantileCuts: duplicate values compress but counts still weight ranks") {
    // n=6, median rank ceil(3)=3 → third-smallest observation = 1.0
    val df = Seq(1.0, 1.0, 1.0, 9.0, 9.0, 9.0).toDF("x")
    val cuts = Aggregations.exactQuantileCuts(df, col("x"), Seq(3), 6)
      .as[Double].head()
    assert(cuts == 1.0)
  }

  test("binByCuts: bin = number of cuts strictly below, boundaries inclusive-left") {
    val df = Seq(10.0, 20.0, 35.0, 60.0, 61.0).toDF("x")
    val cuts = Seq((20.0, 40.0, 60.0)).toDF("cut_0", "cut_1", "cut_2")
    val got = Aggregations.binByCuts(df, col("x"), cuts, 3)
      .select("x", "bin").as[(Double, Long)].collect().sortBy(_._1)
    // 10 ≤ c0 → 0; 20 == c0 → 0; 35 → 1; 60 == c2 → 2; 61 > c2 → 3
    assert(got.toSeq == Seq((10.0, 0L), (20.0, 0L), (35.0, 1L),
      (60.0, 2L), (61.0, 3L)))
  }

  test("integerCorrMatrix matches Spark's built-in corr within tolerance") {
    val rows = (1 to 200).map { i =>
      val x = (i * 7) % 50
      val y = 2 * x + (i % 13) // strongly x-correlated
      val z = (i * 31) % 17 // ~independent
      ("g" + (i % 3), x.toLong, y.toLong, z.toLong)
    }
    val df = rows.toDF("g", "x", "y", "z")
    val got = Aggregations.integerCorrMatrix(df, Seq("g"), Seq(
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
    val builtin = df.groupBy("g").agg(
      corr("x", "y").as("c_xy"), corr("x", "z").as("c_xz"),
      corr("y", "z").as("c_yz"))
    val j = got.join(builtin, "g")
      .select("corr_x_y", "c_xy", "corr_x_z", "c_xz", "corr_y_z", "c_yz")
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    assert(j.nonEmpty)
    j.foreach { case (a1, b1, a2, b2, a3, b3) =>
      assert(approx(a1, b1, 1e-9) && approx(a2, b2, 1e-9) &&
        approx(a3, b3, 1e-9))
    }
    // and the strong pair really is strongly correlated
    j.foreach { case (a1, _, _, _, _, _) => assert(a1 > 0.9) }
  }

  test("integerCorrMatrix: zero-variance column yields null corr") {
    val df = Seq((1L, 5L, 1L), (1L, 5L, 2L), (1L, 5L, 3L))
      .toDF("g", "x", "y")
    val got = Aggregations.integerCorrMatrix(df, Seq("g"),
      Seq("x" -> col("x"), "y" -> col("y")))
    val r = got.select("corr_x_y").collect().head
    assert(r.isNullAt(0))
  }
}
