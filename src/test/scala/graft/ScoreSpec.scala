package graft

import graft.metrics.Score

/** Port of the reference's only executable tests: the scoring doctest
  * goldens (`scoring.py:21-33`) and the schema-validation errors
  * (`scoring.py:35-46`). */
class ScoreSpec extends SparkSpec {
  import spark.implicits._

  private def sol = Seq(
    ("21_12_2_1", 1.0, 4.0), ("21_12_2_2", 2.0, 2.0), ("21_12_2_3", 3.0, 3.0))
    .toDF("id", "x", "y")

  test("doctest golden 1: rmse 0.0913") {
    val sub = Seq(("21_12_2_1", 1.1, 4.0), ("21_12_2_2", 2.0, 2.2),
      ("21_12_2_3", 3.0, 3.0)).toDF("id", "x", "y")
    assert(approx(Score.rmse(sol, sub), 0.0913, 1e-4))
  }

  test("doctest golden 2: rmse 0.4163") {
    val sub = Seq(("21_12_2_1", 0.0, 4.0), ("21_12_2_2", 2.0, 2.2),
      ("21_12_2_3", 3.0, 3.0)).toDF("id", "x", "y")
    assert(approx(Score.rmse(sol, sub), 0.4163, 1e-4))
  }

  test("doctest golden 3: rmse 1.1547") {
    val sub = Seq(("21_12_2_1", 1.0, 4.0), ("21_12_2_2", 2.0, 0.0),
      ("21_12_2_3", 1.0, 3.0)).toDF("id", "x", "y")
    assert(approx(Score.rmse(sol, sub), 1.1547, 1e-4))
  }

  test("missing solution column raises") {
    val bad = sol.drop("y")
    intercept[Score.ScoreError] { Score.rmse(bad, sol) }
  }

  test("missing submission column raises") {
    val bad = sol.withColumnRenamed("x", "xx")
    intercept[Score.ScoreError] { Score.rmse(sol, bad) }
  }

  test("missing id column raises") {
    intercept[Score.ScoreError] { Score.rmse(sol.drop("id"), sol) }
  }
}
