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
    require(trainPct + valPct <= 100, "trainPct/valPct are PERCENTAGES")
    // thresholds scale with the bucket count so the percentages hold
    // for any `buckets` (finer bucket counts give finer granularity,
    // not silently different fractions)
    val trainUpTo = buckets.toLong * trainPct / 100
    val valUpTo = buckets.toLong * (trainPct + valPct) / 100
    val bucket = pmod(key, lit(buckets.toLong))
    val split = when(bucket < trainUpTo, "train")
      .when(bucket < valUpTo, "val")
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

  /** Temperature-based language/domain mixture sampling (the
    * UniMax-style rebalance): group shares are flattened with
    * exponent 1/2 — share_g = sqrt(n_g) / Σ_k sqrt(n_k) — and each
    * group's keep probability is min(1, budget·share_g / n_g), so
    * over-represented groups are down-sampled toward the flattened
    * mixture while small groups keep everything.
    *
    * Engine-portable by construction: sqrt, multiply and divide are
    * IEEE correctly-rounded (bitwise-identical in any engine), the
    * cross-group normalizer is folded in SORTED group order over a
    * collected (tiny: one row per group) list so summation order is
    * fixed (array_sort places a null group key FIRST — a mirroring
    * engine must sort NULLS FIRST too), and the per-row keep decision
    * is an INTEGER comparison
    * `pmod(key, 1e6) < floor(rate·1e6)`. The general-temperature
    * exponent is deliberately not offered: pow() is not
    * correctly-rounded and its cross-engine drift would land keep
    * boundaries on coin flips.
    *
    * Scale: two tiny aggregates (one row per group, then one row
    * total, broadcast back); the per-row decision is map-side. Returns
    * the input plus (rate_ppm, kept).
    *
    * @param key deterministic non-negative long (content fingerprint)
    * @param budgetFrac fraction of ALL rows to target, in [0, 1]
    */
  def temperatureMixture(df: DataFrame, groupCol: String, key: Column,
                         budgetFrac: Double): DataFrame = {
    require(budgetFrac >= 0 && budgetFrac <= 1, "budgetFrac in [0,1]")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n_g"))
    val z = counts.agg(
      sum(col("__n_g")).as("__n_total"),
      aggregate(
        array_sort(collect_list(struct(col(groupCol).as("g"), col("__n_g").as("n")))),
        lit(0.0),
        (acc, s) => acc + sqrt(s.getField("n").cast("double"))).as("__z"))
    val rate = least(lit(1.0),
      ((lit(budgetFrac) * col("__n_total")) *
        (sqrt(col("__n_g").cast("double")) / col("__z"))) / col("__n_g"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(groupCol).as("__g"),
        floor(rate * lit(1000000.0)).cast("long").as("rate_ppm"))
    // null-SAFE key match: groupBy treats null as a real group, so the
    // rates table has a null-group row — a plain equi-join would
    // silently drop those input rows instead of sampling them.
    df.join(broadcast(rates), col(groupCol) <=> col("__g"))
      .drop("__g")
      .withColumn("kept", pmod(key, lit(1000000L)) < col("rate_ppm"))
  }

  /** Deterministic global training shuffle: the "randomize example
    * order" step every pretraining run needs, expressed scalably. A
    * true global sort-by-random is a single total order — one giant
    * range exchange whose boundaries depend on sampling (run-to-run
    * nondeterministic). Instead: shard = key mod nShards, position =
    * rank of key within the shard — readers stream shard 0..n-1 in
    * position order and observe a pseudo-random permutation that is a
    * pure function of content (stable under reruns, re-sharding and
    * engine ports; no rand(), no sampled boundaries).
    *
    * Scale: ONE hash exchange on the shard id + a per-shard local
    * sort; shards are independent, so 100 TB shuffles as nShards
    * embarrassingly-parallel sorted writes. Size nShards so a shard
    * fits an executor's sort spill comfortably (tens of thousands at
    * petabyte scale — the window cost is per shard, not global).
    *
    * @param key deterministic non-negative long (content fingerprint —
    *   NOT a monotone id, which would preserve input order)
    * @param tieBreak unique column; equal keys (hash collisions) must
    *   order deterministically
    */
  def shardShuffle(df: DataFrame, key: Column, tieBreak: Column,
                   nShards: Int): DataFrame = {
    require(nShards > 0)
    val shard = pmod(key, lit(nShards.toLong))
    val w = Window.partitionBy(shard).orderBy(key, tieBreak)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
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

  /** Chunk ASSEMBLY on top of [[chunkPack]]'s layout: explode each doc
    * into the chunks it spans, slice its token array to the piece that
    * falls inside each chunk, and group by (shard, chunk) — the
    * emitted row is one training chunk: contributing doc count, token
    * count, and the ordered token stream (pieces sorted by the docs'
    * global offset, so the stream is exactly the concat-then-cut
    * layout). Shuffle cost: one window (layout) + one groupBy on
    * (shard, chunk) — both on bounded keys.
    */
  def chunkAssemble(df: DataFrame, shard: Seq[Column], order: Seq[Column],
                    toksCol: Column, chunkTokens: Int): DataFrame = {
    val c = lit(chunkTokens.toLong)
    val laid = chunkPack(df, shard, order, size(toksCol).cast("long"),
      chunkTokens)
      .withColumn("__toks", toksCol)
      .filter(size(col("__toks")) > 0)
      .withColumn("chunk_id",
        explode(sequence(col("chunk_first"), col("chunk_last"))))
    // doc's global token span is [cum_before, cum_before + n); the
    // piece inside chunk k covers global [max(cum_before, k*c),
    // min(cum_before + n, (k+1)*c)) — slice is 1-based doc-local.
    val pieceFrom = greatest(col("chunk_id") * c - col("cum_before"), lit(0L))
    val pieceLen =
      least(col("cum_before") + size(col("__toks")), (col("chunk_id") + 1) * c) -
        greatest(col("cum_before"), col("chunk_id") * c)
    val pieces = laid
      .withColumn("piece", slice(col("__toks"), (pieceFrom + 1).cast("int"),
        pieceLen.cast("int")))
    pieces
      .groupBy(shard :+ col("chunk_id"): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("piece"))).cast("long").as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col("cum_before"), col("piece")))),
          e => e.getField("piece"))).as("chunk_tokens"))
  }
}
