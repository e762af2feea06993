package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic splitting / sampling / packing for training-data
  * pipelines (net-new vs the reference — the 100 TB counterparts of
  * the sklearn-style utilities an LLM data pipeline needs).
  *
  * Everything keys off a caller-supplied deterministic column (e.g. a
  * content fingerprint), never `rand()`: retries, reruns and engine
  * ports must all produce the identical split. All assignment math is
  * integer-exact so results are engine-portable bit-for-bit.
  */
object Sampling {

  /** Train/val/test assignment from a deterministic non-negative long
    * key: bucket = key mod `buckets`, boundaries at trainPct/valPct.
    * Returns (bucket, split) columns. A content fingerprint as the key
    * makes the split stable under re-shards and dedup-order changes.
    */
  def hashSplit(key: Column, buckets: Int = 100,
                trainPct: Int = 80, valPct: Int = 10): (Column, Column) = {
    require(trainPct + valPct <= buckets)
    val bucket = pmod(key, lit(buckets.toLong))
    val split = when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
    (bucket, split)
  }

  /** Deterministic per-stratum sample: keeps ceil(n · num/den) rows of
    * each stratum, chosen by the `order` ranking. The keep test is
    * (rn−1)·den < n·num — pure integer arithmetic, no float rate, so
    * the kept set is exact in any engine. One window shuffle on the
    * stratum key.
    */
  def stratifiedSample(df: DataFrame, stratum: Seq[Column],
                       order: Seq[Column], num: Int, den: Int): DataFrame = {
    val w = Window.partitionBy(stratum: _*).orderBy(order: _*)
    val cw = Window.partitionBy(stratum: _*)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter((col("__rn") - 1) * den < col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Context-window packing, concat-then-chunk — the standard LLM
    * pretraining layout: within each shard, documents are laid
    * end-to-end in `order` and the token stream is cut every
    * `chunkTokens`. Emits per doc: the cumulative tokens before it,
    * its first/last chunk ids and its offset inside the first chunk —
    * all exact integers (both engines' doubles are exact to 2^53, far
    * above any shard's token count; the oracle uses `//`).
    *
    * Scale: one window shuffle per shard key; shards are independent,
    * so packing 100 TB is embarrassingly parallel across shards. Keep
    * shards bounded (e.g. lang × source × date) so no single shard's
    * ordered scan dominates.
    */
  def chunkPack(df: DataFrame, shard: Seq[Column], order: Seq[Column],
                tokensCol: Column, chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0)
    val before = Window.partitionBy(shard: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(tokensCol).over(before), lit(0L))
    val c = lit(chunkTokens.toLong)
    df.withColumn("cum_before", cumBefore)
      .withColumn("chunk_first",
        floor(col("cum_before") / c).cast("long"))
      .withColumn("chunk_last",
        when(tokensCol > 0,
          floor((col("cum_before") + tokensCol - 1) / c).cast("long"))
          .otherwise(col("chunk_first")))
      .withColumn("offset_in_chunk", pmod(col("cum_before"), c))
  }
}
