package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF centroid training — the seam the ANN operators
  * ([[graft.operators.Similarity]]) deliberately leave to MLlib:
  * assignment/probe quality is bounded by centroid quality, and
  * learning centroids is a distributed k-means fit, not a query.
  *
  * Scale: KMeans is MLlib's scalable implementation (k-means|| init);
  * the returned centroid TABLE is k rows — a driver-side parameter
  * object by design, exactly like a trained model's coefficients —
  * and is broadcast by every consumer in Similarity.
  */
object IvfCentroids {

  /** Fit k centroids over an `array<float>` embedding column; returns
    * a (centroid_id: long, centroid: array<float>) frame compatible
    * with `Similarity.ivfAssign(..., "centroid_id", "centroid")`. */
  def learn(df: DataFrame, embCol: String, k: Int,
            seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    val feat = df.select(array_to_vector(col(embCol)).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feat)
    val spark = df.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat).toSeq) }
      .toDF("centroid_id", "centroid")
  }
}
