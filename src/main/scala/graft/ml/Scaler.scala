package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** StandardScaler as pure column algebra (SURVEY §2.8 M6,
  * `nn/nn-mps.py:908-912`): one global agg for (mean, sample std) per
  * column, broadcast back via a 1-row cross join, then
  * (x - mean) / std per row. Distributed end to end — the stats row is
  * tiny regardless of input size, so this is a map-side transform at
  * 100 TB. Fit/transform are separable: [[fitTransform]] fuses them
  * into one plan; MLlib's StandardScaler is used inside the model
  * pipelines where a vector column already exists.
  */
object Scaler {

  /** Append `<c>_scaled` for each input column: (x - mean)/std_samp.
    * Columns with zero/undefined std yield null (matches sklearn's
    * behavior of exploding rather than inventing a scale — callers
    * coalesce if they want 0). */
  def fitTransform(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(avg(col(c)).as(s"__mean_$c"), stddev_samp(col(c)).as(s"__std_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val out = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(out) { (d, c) =>
      d.withColumn(s"${c}_scaled",
        (col(c) - col(s"__mean_$c")) / col(s"__std_$c"))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__mean_$c", s"__std_$c")): _*)
  }
}
