package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{Tables, TrackingSchemas}
import graft.metrics.Score
import graft.ml.GbtPair
import graft.pipeline.TreeEnsemblePipeline

/** The switch-over proof: reference-shaped CSVs (exact 23-column
  * schema, ft-in heights with malformed values, per-week files) run
  * through the engine end to end — multi-file scan → height parse →
  * training rows → physics baseline → residual ensemble → submission
  * CSV → competition score. */
class EndToEndSpec extends SparkSpec {

  private def writeFixtures(dir: String): Unit = {
    val rng = new scala.util.Random(17)
    def heightOf(n: Int) = if (n % 5 == 0) "bad" else s"6-${n % 12}"
    val inputHeader = TrackingSchemas.trackingInput.fieldNames.mkString(",")
    val outputHeader = TrackingSchemas.trackingOutput.fieldNames.mkString(",")

    for (week <- 1 to 2) {
      val in = new StringBuilder(inputHeader + "\n")
      val out = new StringBuilder(outputHeader + "\n")
      for (g <- Seq(2023090700L + week); p <- 1 to 3; n <- 1 to 8) {
        val x0 = rng.nextDouble() * 80 + 20
        val y0 = rng.nextDouble() * 40 + 5
        val sp = rng.nextDouble() * 7 + 1
        val d = rng.nextDouble() * 360
        val vx = sp * math.sin(math.toRadians(d))
        val vy = sp * math.cos(math.toRadians(d))
        val side = if (n % 2 == 0) "Offense" else "Defense"
        val role = if (n == 2) "Targeted Receiver" else "Other Route Runner"
        for (f <- 1 to 12) {
          in.append(Seq(
            g, p, n == 2, n, f, "right", 35, s"P$n", heightOf(n),
            200.0 + n, "1995-01-01", "WR", side, role,
            f"${x0 + vx * f / 10}%.4f", f"${y0 + vy * f / 10}%.4f",
            f"$sp%.4f", "0.5", f"$d%.2f", f"$d%.2f",
            3, f"${x0 + vx * 2}%.4f", f"${y0 + vy * 2}%.4f").mkString(",") + "\n")
        }
        // future truth: physics from last frame + learnable pattern
        val (lx, ly) = (x0 + vx * 1.2, y0 + vy * 1.2)
        for (h <- 1 to 3) {
          val xt = math.min(120, math.max(0,
            lx + vx * h / 10 + 1.5 * math.sin(lx / 10)))
          val yt = math.min(53.3, math.max(0,
            ly + vy * h / 10 + 1.2 * math.cos(ly / 7)))
          out.append(s"$g,$p,$n,$h,$xt,$yt\n")
        }
      }
      Files.writeString(java.nio.file.Path.of(dir, s"input_w0$week.csv"),
        in.toString)
      Files.writeString(java.nio.file.Path.of(dir, s"output_w0$week.csv"),
        out.toString)
    }
  }

  test("reference-schema CSVs: scan → features → ensemble → submission → score") {
    val dir = Files.createTempDirectory("graft_e2e").toString
    writeFixtures(dir)

    // S1/S2: multi-week explicit-schema scans.
    val input = Tables.csv(spark, TrackingSchemas.trackingInput,
      s"$dir/input_w01.csv", s"$dir/input_w02.csv")
    val output = Tables.csv(spark, TrackingSchemas.trackingOutput,
      s"$dir/output_w01.csv", s"$dir/output_w02.csv")
    assert(input.count() == 2L * 3 * 8 * 12)
    assert(output.count() == 2L * 3 * 8 * 3)

    // P7: ft-in parse with malformed fallback; P6: role one-hot.
    val heights = input.select(
      graft.functions.Scalars.heightToInches(col("player_height"), Some(72.0))
        .as("h")).distinct().collect().map(_.getDouble(0))
    assert(heights.forall(h => h >= 72.0 && h < 84.0))

    // Training rows from the reference-shaped truth.
    val truth = output.select(
      col("game_id"), col("play_id"), col("nfl_id"),
      col("frame_id").cast("long").as("frame_id_out"),
      col("x").as("x_true"), col("y").as("y_true"))
    val frames = input.select("game_id", "play_id", "frame_id", "nfl_id",
      "x", "y", "s", "dir", "player_side")
    val r = TreeEnsemblePipeline.run(frames, truth,
      TreeEnsemblePipeline.Config(k = 2,
        gbt = GbtPair.Params(maxIter = 8, maxDepth = 3, fitPartitions = 4)))
    assert(r.rmsePhysics > 0 && r.rmsePhysics < 5.0)
    assert(r.rmseEnsemble < r.rmsePhysics)

    // S4 + M9: submission sink, read back, score against the solution.
    val submission = r.oof.select(
      concat_ws("_", col("game_id"), col("play_id"), col("nfl_id"),
        col("frame_id_out")).as("id"),
      col("pred_x").as("x"), col("pred_y").as("y"))
    Tables.writeSubmission(submission, s"$dir/submission")
    val restored = Tables.csv(spark, TrackingSchemas.submission,
      s"$dir/submission")
    assert(restored.count() == submission.count())
    val solution = truth.select(
      concat_ws("_", col("game_id"), col("play_id"), col("nfl_id"),
        col("frame_id_out")).as("id"),
      col("x_true").as("x"), col("y_true").as("y"))
    val rmse = Score.rmse(solution, restored)
    assert(math.abs(rmse - r.rmseEnsemble) < 1e-4) // CSV roundtrip preserved
  }
}
