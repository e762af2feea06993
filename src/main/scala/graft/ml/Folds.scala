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

  /** Scale-safe rank fold: the rank runs over the DISTINCT group keys
    * only (distinct keys << rows), and through DistRank's bucketed
    * two-pass — dense_rank on a distinct-key frame equals row_number,
    * and even an unbounded key domain never funnels into one task
    * (the old `dense_rank over Window.orderBy(key)` was a
    * single-partition sort of the key table). */
  def withRankFold(df: DataFrame, groupCols: Seq[String], k: Int,
                   foldCol: String = "fold"): DataFrame = {
    val lead = df.schema(groupCols.head).dataType match {
      case org.apache.spark.sql.types.StringType =>
        graft.operators.DistRank.stringKey(col(groupCols.head))
      case _ => col(groupCols.head).cast("double")
    }
    val keys = graft.operators.DistRank.rowNumber(
        df.select(groupCols.map(col): _*).distinct(), lead,
        groupCols.map(col), "__rn")
      .withColumn(foldCol, ((col("__rn") - 1L) % k).cast("int"))
      .drop("__rn")
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
