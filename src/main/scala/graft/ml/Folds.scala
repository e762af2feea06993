package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fold assignment for cross-validation (SURVEY.md §2.8 M1).
  *
  * The reference uses sklearn GroupKFold over concatenated
  * (game,play,nfl) keys (`main_cuda.py:726-737`) and seeded KFold
  * (`main_cuda.py:1465-1467`). sklearn's assignment is size-balanced;
  * we provide two deterministic, group-disjoint equivalents:
  *  - [[rankFold]]: dense_rank over sorted group keys mod k — exactly
  *    reproducible in SQL (used by the correctness oracle). The
  *    dense_rank needs a global sort of distinct group keys; fine for
  *    fold assignment (distinct keys << rows), and at scale the
  *    hash variant avoids the sort entirely.
  *  - [[hashFold]]: pmod(hash(key), k) — shuffle-free, O(1) per row,
  *    the 100 TB path.
  */
object Folds {

  /** Scale-safe rank fold: dense_rank runs over the DISTINCT group keys
    * only (distinct keys << rows — the global sort touches thousands of
    * keys, not billions of rows), then joins the assignment back.
    * A naive `dense_rank over Window.orderBy(key)` on the full frame
    * would funnel every row through one partition. */
  def withRankFold(df: DataFrame, groupCols: Seq[String], k: Int,
                   foldCol: String = "fold"): DataFrame = {
    val keys = df.select(groupCols.map(col): _*).distinct()
      .withColumn(foldCol,
        ((dense_rank().over(Window.orderBy(groupCols.map(col): _*)) - 1) % k)
          .cast("int"))
    // Null-safe join: a plain equi-join would silently DROP rows whose
    // group key contains a null (null != null) instead of folding them.
    val renamed = groupCols.foldLeft(keys)((d, c) =>
      d.withColumnRenamed(c, s"__k_$c"))
    val cond = groupCols.map(c => df(c) <=> renamed(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(renamed), cond)
      .drop(groupCols.map(c => s"__k_$c"): _*)
  }

  def hashFold(groupKey: Column, k: Int): Column =
    pmod(hash(groupKey), lit(k))

  /** Train/validation split column: shuffle-free O(1)-per-row hash
    * assignment — the 100 TB path. Group-disjoint by construction. */
  def withFold(df: DataFrame, groupCols: Seq[String], k: Int,
               foldCol: String = "fold"): DataFrame =
    df.withColumn(foldCol, hashFold(concat_ws("_", groupCols.map(col): _*), k))
}
