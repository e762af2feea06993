package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Scalars
import graft.ml.Scaler
import graft.operators.Temporal

/** E2: the sequence-model feature pipeline (`nn/nn-mps.py:244-665`) up
  * to the tensor boundary — the NN itself is an external scorer
  * (SURVEY §2.8 M8): Spark builds the windowed per-entity feature
  * tensors; a frozen model would apply via mapPartitions.
  *
  * Stages: per-frame scalar features (P2/P4/P10) → temporal block
  * over the canonical window (W1 lag, W3 diff, W5 EMA, A6 cumcount) →
  * group-mean imputation (A4) → global standardization (M6) →
  * sequence build: trailing `window`-frame array of feature structs
  * per (game, play, entity) frame (`collect_list(struct) over
  * rowsBetween`), keeping the last frame's sequence per entity.
  *
  * One exchange on (game_id, play_id, nfl_id) serves every window op;
  * the tensor rows are bounded by window x n_features per entity.
  */
object SequenceFeaturePipeline {

  val SeqFeatures: Seq[String] = Seq(
    "x", "y", "s", "vx", "vy", "dir_change", "dist_center", "progress")

  /** Per-entity sequences of the last `window` observed frames.
    * Output: (game_id, play_id, nfl_id, seq) where seq is
    * array<struct<SeqFeatures...>> ordered by frame_id. */
  def build(frames: DataFrame, window: Int = 8): DataFrame = {
    val w = Temporal.spec(
      Seq(col("game_id"), col("play_id"), col("nfl_id")), Seq(col("frame_id")))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("game_id", "play_id", "nfl_id")

    val feats = frames
      .withColumn("vx", Scalars.velocityX(col("s"), col("dir")))
      .withColumn("vy", Scalars.velocityY(col("s"), col("dir")))
      .withColumn("dir_change",
        Scalars.angleWrap(Temporal.diff(col("dir"), w)))
      .withColumn("dist_center", Scalars.distFromCenter(col("x"), col("y")))
      .withColumn("progress",
        Temporal.cumCount(w).cast("double") /
          greatest(count(lit(1)).over(wAll) - 1, lit(1)))

    // A4: group-mean imputation for the lag-born nulls (dir_change at
    // the group head), then a defensive global fill.
    val imputed = feats.withColumn("dir_change",
      coalesce(col("dir_change"), avg(col("dir_change")).over(wAll), lit(0.0)))

    // M6: global standardization of the continuous features.
    val scaled = Scaler.fitTransform(imputed, Seq("x", "y", "s", "vx", "vy"))
      .withColumn("x_s", coalesce(col("x_scaled"), lit(0.0)))
      .withColumn("y_s", coalesce(col("y_scaled"), lit(0.0)))
      .withColumn("s_s", coalesce(col("s_scaled"), lit(0.0)))
      .withColumn("vx_s", coalesce(col("vx_scaled"), lit(0.0)))
      .withColumn("vy_s", coalesce(col("vy_scaled"), lit(0.0)))

    // M8: trailing-window sequence tensor, one row per entity (the
    // sequence ending at the last observed frame).
    val seqCol = collect_list(struct(
      col("x_s").as("x"), col("y_s").as("y"), col("s_s").as("s"),
      col("vx_s").as("vx"), col("vy_s").as("vy"),
      col("dir_change"), col("dist_center"), col("progress")))
      .over(w.rowsBetween(-(window - 1), 0))

    scaled
      .withColumn("seq", seqCol)
      .withColumn("__rn", row_number().over(w.orderBy(col("frame_id").desc)))
      .filter(col("__rn") === 1)
      .select("game_id", "play_id", "nfl_id", "seq")
  }
}
