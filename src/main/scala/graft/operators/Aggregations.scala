package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic grouped-aggregation helpers (SURVEY §2.4 A2/A3/A4) — the
  * reference's `groupby().agg(name=(col, fn))` and
  * `groupby().transform(stat)` shapes (`main_cuda.py:365-380,
  * 253-257`; imputation `nn/nn-mps.py:573-629`).
  *
  * Scale: one hash-partial + final-agg shuffle for [[multiAgg]]; ONE
  * shared window exchange for every stat in [[groupedTransform]] (all
  * stats ride the same partitioning).
  */
object Aggregations {

  /** A2: multi-aggregation with named outputs.
    * `specs` = (outputName, aggregateExpression). Weighted means are
    * expressed as pre-multiplied sums (the reference's own algebraic
    * rewrite — Catalyst won't invent it): sum(w*x)/sum(w). */
  def multiAgg(df: DataFrame, keys: Seq[String],
               specs: Seq[(String, Column)]): DataFrame = {
    val aggs = specs.map { case (n, c) => c.as(n) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A3: grouped transform — append per-group stats to every row
    * without collapsing. `stats` maps output suffix -> stat builder.
    * Every stat shares the single window exchange on `keys`. */
  def groupedTransform(df: DataFrame, keys: Seq[String], cols: Seq[String],
                       stats: Map[String, Column => Column] = DefaultStats): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    stats.foldLeft(df) { case (d, (suffix, stat)) =>
      cols.foldLeft(d)((dd, c) =>
        dd.withColumn(s"${c}_$suffix", stat(col(c)).over(w)))
    }
  }

  val DefaultStats: Map[String, Column => Column] = Map(
    "mean" -> (c => avg(c)),
    "std" -> (c => stddev_samp(c)),
    "min" -> (c => min(c)),
    "max" -> (c => max(c)))

  /** Robust per-group outlier flagging by median absolute deviation:
    * flag rows with |x − median| > k·MAD. The standard data-cleaning
    * robust alternative to z-scores (immune to the outliers it hunts).
    *
    * Two exact-percentile aggregations (median, then MAD over the
    * deviations) — per-group stats are tiny and broadcast back, so the
    * big table is scanned twice but never shuffled on a non-key
    * column. Stats joins are null-SAFE: groupBy emits a real stats row
    * for a null group key, and a plain equi-join would silently drop
    * those input rows. The flag compares 6-dp-rounded quantities:
    * exact percentile interpolation is engine-portable only to a few
    * ulp, and a RAW boundary comparison would let that drift flip
    * flags.
    *
    * Returns one row per input row: (groups..., idCols..., med, mad,
    * outlier). */
  def madOutliers(df: DataFrame, groups: Seq[String], idCols: Seq[String],
                  valueCol: String, k: Double): DataFrame = {
    def joinStats(left: DataFrame, stats: DataFrame): DataFrame = {
      val renamed = groups.foldLeft(stats)((d, g) =>
        d.withColumnRenamed(g, s"__r_$g"))
      val cond = groups.map(g => col(g) <=> col(s"__r_$g")).reduce(_ && _)
      groups.foldLeft(left.join(broadcast(renamed), cond))(
        (d, g) => d.drop(s"__r_$g"))
    }
    val med = df.groupBy(groups.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val dev = joinStats(df, med)
      .withColumn("__adev", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(groups.map(col): _*)
      .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
    joinStats(dev, mad)
      .select((groups ++ idCols).map(col) ++ Seq(
        round(col("__med"), 6).as("med"),
        round(col("__mad"), 6).as("mad"),
        (round(col("__adev"), 6) > lit(k) * round(col("__mad"), 6))
          .as("outlier")): _*)
  }

  /** A4: group-mean imputation — null values replaced by the group
    * mean of the non-null values (window avg ignores nulls), with an
    * optional global fallback for all-null groups. */
  def imputeGroupMean(df: DataFrame, keys: Seq[String], cols: Seq[String],
                      fallback: Option[Double] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    cols.foldLeft(df) { (d, c) =>
      val imputed = coalesce(col(c) +: avg(col(c)).over(w) +:
        fallback.map(lit).toSeq: _*)
      d.withColumn(c, imputed)
    }
  }
}
