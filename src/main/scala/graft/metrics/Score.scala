package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference's competition metric (`scoring.py:10-53`):
  * inner join solution x submission on `id`, then
  * RMSE = sqrt(0.5*(MSE_x + MSE_y)). Schema validation reproduces the
  * ParticipantVisibleError cases (`scoring.py:35-46`).
  */
object Score {

  final class ScoreError(msg: String) extends IllegalArgumentException(msg)

  /** The metric as a 1-row DataFrame — stays a distributed plan (one
    * inner join + a single-pass global agg) until the caller acts. */
  def rmseDF(solution: DataFrame, submission: DataFrame,
             rowIdColumn: String = "id"): DataFrame = {
    for (c <- Seq(rowIdColumn, "x", "y")) {
      if (!solution.columns.contains(c))
        throw new ScoreError(s"Solution is missing column $c")
      if (!submission.columns.contains(c))
        throw new ScoreError(s"Submission is missing column $c")
    }
    val sol = solution.select(col(rowIdColumn),
      col("x").as("x_true"), col("y").as("y_true"))
    val sub = submission.select(col(rowIdColumn),
      col("x").as("x_pred"), col("y").as("y_pred"))
    sol.join(sub, rowIdColumn)
      .agg(
        avg(pow(col("x_true") - col("x_pred"), 2)).as("mse_x"),
        avg(pow(col("y_true") - col("y_pred"), 2)).as("mse_y"))
      .select(sqrt(lit(0.5) * (col("mse_x") + col("mse_y"))).as("rmse"))
  }

  /** Distributed metric collapsed to the driver-side double. */
  def rmse(solution: DataFrame, submission: DataFrame,
           rowIdColumn: String = "id"): Double =
    rmseDF(solution, submission, rowIdColumn).head().getDouble(0)
}
