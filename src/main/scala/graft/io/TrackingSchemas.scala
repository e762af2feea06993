package graft.io

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's NFL tracking data model
  * (FIXTURES.md §1-4; column dictionary at
  * reference docs/dataset.txt:6-52). Declared, never inferred.
  */
object TrackingSchemas {

  /** train/input_2023_w[01-18].csv and test_input.csv — one row per
    * (game, play, player, frame) at 10 Hz. */
  val trackingInput: StructType = StructType(Seq(
    StructField("game_id", LongType),
    StructField("play_id", IntegerType),
    StructField("player_to_predict", BooleanType),
    StructField("nfl_id", IntegerType),
    StructField("frame_id", IntegerType),
    StructField("play_direction", StringType),
    StructField("absolute_yardline_number", IntegerType),
    StructField("player_name", StringType),
    StructField("player_height", StringType),   // "6-2" ft-in, see Scalars.heightToInches
    StructField("player_weight", DoubleType),   // lbs
    StructField("player_birth_date", DateType),
    StructField("player_position", StringType),
    StructField("player_side", StringType),     // Offense | Defense
    StructField("player_role", StringType),
    StructField("x", DoubleType),               // 0-120 yd
    StructField("y", DoubleType),               // 0-53.3 yd
    StructField("s", DoubleType),               // yd/s
    StructField("a", DoubleType),               // yd/s^2
    StructField("o", DoubleType),               // orientation deg
    StructField("dir", DoubleType),             // motion angle deg, 0 = +y
    StructField("num_frames_output", IntegerType),
    StructField("ball_land_x", DoubleType),
    StructField("ball_land_y", DoubleType)))

  /** train/output_2023_w[01-18].csv — targets. frame_id restarts at 1
    * post-throw (reference data/train/output_2023_w01.csv:1). */
  val trackingOutput: StructType = StructType(Seq(
    StructField("game_id", LongType),
    StructField("play_id", IntegerType),
    StructField("nfl_id", IntegerType),
    StructField("frame_id", IntegerType),
    StructField("x", DoubleType),
    StructField("y", DoubleType)))

  /** test.csv — one row per position to predict. */
  val testTemplate: StructType = StructType(Seq(
    StructField("game_id", LongType),
    StructField("play_id", IntegerType),
    StructField("nfl_id", IntegerType),
    StructField("frame_id", IntegerType)))

  /** submission.csv — id = "{game_id}_{play_id}_{nfl_id}_{frame_id}"
    * (reference main_cuda.py:1533-1540). */
  val submission: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("x", DoubleType),
    StructField("y", DoubleType)))
}
