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

  /** EXACT lower quantile cut points of `c` at probabilities
    * `num_i/den`, as ONE row of columns `cut_0..cut_{k-1}` (cut_i =
    * smallest value whose cumulative count reaches ceil(n·num_i/den)
    * — type-7-discrete / `quantile_disc` semantics, an actual data
    * value, so the result is bitwise engine-portable with no
    * rounding).
    *
    * Scale shape: the table is first compressed to DISTINCT values
    * with counts (one hash-agg shuffle), and only that compressed
    * table rides the single-partition cumulative window — for feature
    * columns with bounded cardinality (prices, scores) this is tiny
    * regardless of row count. For genuinely continuous 100 TB columns
    * fit on a sample, or use approx_percentile; this is the exact
    * path a discretizer FIT wants.
    */
  def exactQuantileCuts(df: DataFrame, c: Column,
                        probs: Seq[Int], den: Int): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= den))
    val counted = df.select(c.as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    // distributed cumsum over the distinct-value lattice (DistRank's
    // bucketed two-pass; total rides along as a literal) — the value
    // domain is unbounded on a real column, so no global window
    val cum = DistRank.cumsum(counted, col("v"), Seq(col("v")),
        Seq((col("cnt"), "cum")), totalsSuffix = Some("__t"))
      .withColumnRenamed("cum__t", "n")
    // cum >= ceil(n·p/den)  ⟺  cum·den >= n·p  (exact integers)
    val cuts = probs.zipWithIndex.map { case (p, i) =>
      min(when(col("cum") * den >= col("n") * p, col("v")))
        .as(s"cut_$i")
    }
    cum.agg(cuts.head, cuts.tail: _*)
  }

  /** Discretizer TRANSFORM: assigns `bin` = number of fitted cut
    * points strictly below the value (0..k); a NULL value gets a NULL
    * bin (the FIT side excludes nulls, so lumping them into bin 0
    * would silently conflate "missing" with "lowest"). The one-row
    * `cuts` frame is a broadcast parameter join — no shuffle on `df`.
    */
  def binByCuts(df: DataFrame, c: Column, cuts: DataFrame,
                k: Int): DataFrame = {
    val bin = when(c.isNull, lit(null).cast("long")).otherwise(
      (0 until k).map(i =>
        when(c > col(s"cut_$i"), 1L).otherwise(0L)).reduce(_ + _))
    df.crossJoin(broadcast(cuts))
      .withColumn("bin", bin)
      .drop((0 until k).map(i => s"cut_$i"): _*)
  }

  /** Pairwise Pearson correlation matrix per group from EXACT integer
    * co-moments: every input must already be an integer-scaled column
    * (cents, percent ticks …) so the grouped sums are exact BIGINTs
    * and corr = (n·sxy − sx·sy) / (√(n·sxx−sx²)·√(n·syy−sy²)) is a
    * fixed tree of correctly-rounded double ops — bitwise
    * engine-portable, no rounding (verify-skill trap #10; same recipe
    * as the per-group OLS). One hash-agg shuffle total for ALL pairs.
    * Callers must keep n·Σx² below 2^63 (scale the integerization
    * accordingly).
    */
  def integerCorrMatrix(df: DataFrame, keys: Seq[String],
                        vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2)
    // internal moment aliases are INDEX-based (s_0, x_0_1): name-based
    // aliases would collide for variable names containing underscores
    // ("a","b","a_b" would make the (a,b) cross-moment shadow the
    // plain sum of "a_b")
    val moments =
      vars.indices.map(i => sum(vars(i)._2).as(s"s_$i")) ++
        (for (i <- vars.indices; j <- i until vars.size)
          yield sum(vars(i)._2 * vars(j)._2).as(s"x_${i}_$j"))
    val a = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), moments: _*)
    val corrs = for (i <- vars.indices; j <- (i + 1) until vars.size)
      yield {
        val (ni, _) = vars(i); val (nj, _) = vars(j)
        val num = col("n") * col(s"x_${i}_$j") -
          col(s"s_$i") * col(s"s_$j")
        val vi = col("n") * col(s"x_${i}_$i") -
          col(s"s_$i") * col(s"s_$i")
        val vj = col("n") * col(s"x_${j}_$j") -
          col(s"s_$j") * col(s"s_$j")
        when(vi > 0 && vj > 0,
          num.cast("double") /
            (sqrt(vi.cast("double")) * sqrt(vj.cast("double"))))
          .as(s"corr_${ni}_$nj")
      }
    a.select((keys.map(col) :+ col("n")) ++ corrs: _*)
  }
}
