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
