package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M2/M3: the (x, y) gradient-boosted regressor pair
  * (`main_cuda.py:721-809` CatBoost, `812-997` XGB/LGB — capability
  * parity via MLlib GBTRegressor; the reference's three GBM libraries
  * are the same operator with different hyperparameters, SURVEY §2.8).
  *
  * Training is a distributed MLlib fit; inference is a model broadcast
  * + map-side transform — no shuffle. At 100 TB the fit runs on a
  * sampled/aggregated training table (as the reference trains on the
  * 562k-row training-row table, not the 4.9M-row tracking table).
  */
object GbtPair {

  /** fitPartitions: boosting runs hundreds of tiny jobs; when the
    * training-row table is small relative to the parallelism, per-task
    * scheduler overhead dominates the fit. >0 coalesces the assembled
    * table before fitting (right-size to rows/~50k); 0 leaves the
    * caller's partitioning (the choice at real cluster scale). */
  case class Params(maxIter: Int = 20, maxDepth: Int = 5,
                    stepSize: Double = 0.08, subsamplingRate: Double = 1.0,
                    seed: Long = 42L, fitPartitions: Int = 0)

  case class Model(mx: GBTRegressionModel, my: GBTRegressionModel,
                   features: Seq[String])

  /** Assemble the feature vector column. Nulls must be handled by the
    * caller (group-mean imputation / fillna) — assembler uses "skip"
    * so unclean rows drop rather than poison the fit. */
  def assemble(df: DataFrame, features: Seq[String],
               outCol: String = "features"): DataFrame =
    new VectorAssembler()
      .setInputCols(features.toArray)
      .setOutputCol(outCol)
      .setHandleInvalid("skip")
      .transform(df)

  def train(train: DataFrame, features: Seq[String],
            targetX: String, targetY: String,
            p: Params = Params()): Model = {
    val prepared = assemble(train, features)
    val assembled =
      (if (p.fitPartitions > 0) prepared.coalesce(p.fitPartitions)
       else prepared).cache()
    def gbt(target: String) = new GBTRegressor()
      .setFeaturesCol("features").setLabelCol(target)
      .setMaxIter(p.maxIter).setMaxDepth(p.maxDepth)
      .setStepSize(p.stepSize).setSubsamplingRate(p.subsamplingRate)
      .setSeed(p.seed)
    try {
      // The x and y fits are independent jobs over the same cached
      // table — run them concurrently (cache warmed first so the two
      // fit threads don't race to compute it).
      assembled.count()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val fx = scala.concurrent.Future(gbt(targetX).fit(assembled))
        val fy = scala.concurrent.Future(gbt(targetY).fit(assembled))
        import scala.concurrent.duration.Duration
        Model(scala.concurrent.Await.result(fx, Duration.Inf),
          scala.concurrent.Await.result(fy, Duration.Inf), features)
      } finally pool.shutdown()
    } finally assembled.unpersist()
  }

  /** Append prediction columns; input needs the same feature columns. */
  def predict(df: DataFrame, m: Model,
              outX: String = "pred_x", outY: String = "pred_y"): DataFrame = {
    val assembled = assemble(df, m.features)
    val px = m.mx.setPredictionCol(outX).transform(assembled)
    m.my.setPredictionCol(outY).transform(px).drop("features")
  }

  /** S5: persist / restore the model pair. */
  def save(m: Model, path: String): Unit = {
    m.mx.write.overwrite().save(s"$path/x")
    m.my.write.overwrite().save(s"$path/y")
  }
  def load(path: String, features: Seq[String]): Model =
    Model(GBTRegressionModel.load(s"$path/x"),
      GBTRegressionModel.load(s"$path/y"), features)
}
