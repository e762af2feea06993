package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame

/** M5: Ridge stacking meta-learner (`main_cuda.py:1128-1346`): the
  * out-of-fold prediction matrix (base-model preds as columns) feeds a
  * ridge regression — MLlib LinearRegression with L2 only
  * (elasticNetParam=0, regParam=alpha), matching sklearn Ridge(alpha).
  */
object Stacking {

  case class Model(m: LinearRegressionModel, features: Seq[String])

  def train(oof: DataFrame, predCols: Seq[String], target: String,
            alpha: Double = 1.0): Model = {
    val assembled = new VectorAssembler()
      .setInputCols(predCols.toArray).setOutputCol("meta_features")
      .setHandleInvalid("skip")
      .transform(oof)
    val lr = new LinearRegression()
      .setFeaturesCol("meta_features").setLabelCol(target)
      .setElasticNetParam(0.0).setRegParam(alpha)
      .setStandardization(true)
    Model(lr.fit(assembled), predCols)
  }

  def predict(df: DataFrame, m: Model, outCol: String): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(m.features.toArray).setOutputCol("meta_features")
      .setHandleInvalid("skip")
      .transform(df)
    m.m.setPredictionCol(outCol).transform(assembled).drop("meta_features")
  }
}
