package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Benchmark decontamination: flag training documents that share any
  * token n-gram with an evaluation/benchmark set (the GPT-3-style
  * "13-gram overlap" check, parameterized n).
  *
  * Scale shape for 100 TB of train vs a few MB of benchmarks:
  *  - the benchmark side collapses to its DISTINCT gram set once —
  *    tiny — and is broadcast, so the train side is one map-side
  *    semi-probe: no shuffle of train text, no shuffle at all until
  *    the per-doc hit count (ids + counts only);
  *  - train grams are exploded lazily inside the same stage as the
  *    scan — the gram strings never leave the executor that read the
  *    doc;
  *  - output is one row per train doc (n-gram hit count + flag), so
  *    downstream filters compose (`WHERE NOT contaminated`).
  */
object Contamination {

  /** Distinct space-joined token n-grams of normalized text. Docs with
    * fewer than n tokens get an empty array (guarded — Spark's
    * `sequence` would happily count DOWN for a negative span). */
  def tokenNgrams(textCol: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    tokenNgramsOf(Text.tokens(Text.normalizeAz(textCol)), n)

  /** [[tokenNgrams]] over an ALREADY-MATERIALIZED tokens column.
    * Callers on a hot path must bind the tokenize expression to a
    * column first: `toks` is referenced once per gram index inside
    * the transform lambda, and a non-attribute subtree there
    * re-evaluates normalize+split per index — O(len²) per doc (the
    * interpreted-HOF trap, see the verify skill). */
  def tokenNgramsOf(toks: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(typedLit(Seq.empty[String])))

  /** One row per doc in `train`: (idCol, n_hits, contaminated), where
    * n_hits counts the doc's DISTINCT n-grams that appear anywhere in
    * `bench`. */
  def flagContaminated(train: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String, n: Int): DataFrame = {
    // tokens bound to a column BEFORE the gram transform — the lambda
    // then references an attribute, not the tokenize tree (O(len),
    // not O(len²); see tokenNgramsOf)
    val benchGrams = bench
      .select(Text.tokens(Text.normalizeAz(col(textCol))).as("__toks"))
      .select(explode(tokenNgramsOf(col("__toks"), n)).as("gram"))
      .distinct()
    val trainGrams = train
      .select(col(idCol),
        Text.tokens(Text.normalizeAz(col(textCol))).as("__toks"))
      .select(col(idCol), explode(tokenNgramsOf(col("__toks"), n)).as("gram"))
    val hits = trainGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }
}
