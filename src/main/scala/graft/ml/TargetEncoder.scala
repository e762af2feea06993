package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leak-free (out-of-fold) target encoding of a categorical column:
  * each row's category is replaced by the target mean computed from
  * every fold EXCEPT the row's own — the standard guard against the
  * encoder memorizing its own row's label (net-new vs the reference,
  * which one-hots its low-cardinality categoricals; this is the
  * high-cardinality alternative its M1/M2 fold machinery composes
  * with).
  *
  * Exactness: the target must arrive integer-scaled (counts, cents) —
  * the encoding is then (S_cat − S_cat,fold) / (n_cat − n_cat,fold),
  * one division of exact BIGINTs, bitwise engine-portable.
  *
  * Scale shape: ONE aggregation shuffle over the data (keyed
  * cat×fold), a window over the tiny (cat × k) stats table, and a
  * broadcast join back — the input is never shuffled a second time.
  */
object TargetEncoder {

  /** Appends `enc` (OOF target mean, null when the row's category
    * exists only in its own fold). `target` must be an integral
    * column; `fold` an integer fold id.
    *
    * `broadcastStats` (default true) force-broadcasts the cat×fold
    * stats table — right for the common bounded-cardinality case. For
    * a categorical whose cardinality × k could exceed the broadcast
    * cap / driver memory, pass false and let the planner pick the
    * join (AQE still broadcasts when the stats turn out small). */
  def oofEncode(df: DataFrame, cat: String, fold: String,
                target: Column, broadcastStats: Boolean = true): DataFrame = {
    val stats = df.groupBy(col(cat), col(fold))
      .agg(count(lit(1)).as("__n_cf"), sum(target).as("__s_cf"))
    val wc = Window.partitionBy(col(cat))
    val enc = stats.select(col(cat), col(fold),
      sum(col("__n_cf")).over(wc).as("__n_c"),
      sum(col("__s_cf")).over(wc).as("__s_c"),
      col("__n_cf"), col("__s_cf"))
      .select(col(cat), col(fold),
        when(col("__n_c") > col("__n_cf"),
          (col("__s_c") - col("__s_cf")).cast("double") /
            (col("__n_c") - col("__n_cf")).cast("double"))
          .as("enc"))
    df.join(if (broadcastStats) broadcast(enc) else enc, Seq(cat, fold), "left")
  }
}
