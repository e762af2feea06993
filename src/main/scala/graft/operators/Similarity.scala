package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k against a query vector — a single
  * codegen'd projection (the query is a literal array, effectively
  * broadcast) + a global top-k. No shuffle except the final ordering,
  * which AQE collapses to a single reduce for small k.
  *
  * Scale path: IVF — vectors are assigned to the nearest of K
  * centroids in one pass (centroids broadcast), stored bucketed by
  * centroid; a query probes only its nprobe nearest clusters, turning
  * a 100 TB scan into a targeted partition read.
  */
object Similarity {

  def queryLit(q: Seq[Double]): Column = array(q.map(lit): _*)

  /** Cosine of every row's embedding against a literal query vector. */
  def cosineToQuery(df: DataFrame, embCol: String, q: Seq[Double]): DataFrame =
    df.withColumn("cos", Vectors.cosine(col(embCol), queryLit(q)))

  /** Brute-force top-k by cosine (deterministic tiebreak on idCol). */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     q: Seq[Double], k: Int): DataFrame =
    cosineToQuery(df, embCol, q)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cos"))

  /** Codebook size above which ivfAssign abandons the fused literal
    * path: 16384 centroids × typical dims stays comfortably inside a
    * broadcast / constant-pool budget; beyond it the distributed
    * fallback takes over. */
  val FastPathCap = 16384

  /** IVF assignment: nearest centroid per vector. `centroids` is small
    * (K rows) and broadcast; ties break on the lower centroid id.
    * Returns df + (centroid_id: long, centroid_cos: double) — the
    * centroid id is cast to long on BOTH paths.
    *
    * CONTRACT. Building the plan runs one BOUNDED Spark action on
    * `centroids` (`limit(FastPathCap + 1).collect()` — at most 16385
    * rows ever reach the driver, so a huge codebook cannot OOM the
    * probe). Callers that rebuild the same query repeatedly (bench
    * loops, plan audits) should pass a driver-materialized local
    * centroid frame — see `graft.queries.Q.ivfCentroids`, which
    * memoizes the codebook per (dir, fingerprint) so the probe costs
    * nothing per build. An EMPTY codebook yields an EMPTY result on
    * both paths (no vector has a nearest centroid). Embeddings must be
    * NaN-free (the P8 sanitize contract): a NaN cosine can never win
    * the fused strict-'>' scan but sorts greatest under the fallback's
    * struct-max, so NaN behavior is explicitly unspecified here.
    *
    * Fused fast path (K ≤ [[FastPathCap]]): the whole argmax is ONE
    * codegen'd projection — graft.functions.CentroidArgmax loops the
    * literal centroid matrix per row, so the N×K candidate ROWS (the
    * measured ~90% of assignment wall at the 100x step), the struct
    * packing and the hash-agg all disappear; bitwise-identical winners
    * by construction (same folds, same guard, same tie order).
    *
    * Fallback (K > cap): a PAYLOAD-FREE winner aggregate — only
    * (id, emb) enter the N×K candidate stage, the argmax is
    * max(struct(cos, −cid)) with map-side partial combine (never a
    * window sort: at K = √N the candidate table is N^1.5 rows), and
    * the payload is joined back on idCol afterwards. One extra
    * shuffle of df by id, in exchange for candidate rows that carry
    * two doubles instead of the whole row — the trade that wins at
    * any realistic payload width. */
  def ivfAssign(df: DataFrame, idCol: String, embCol: String,
                centroids: DataFrame, cIdCol: String, cEmbCol: String): DataFrame = {
    val payload = df.columns.filter(_ != idCol)
    // Bounded probe-collect: one action, at most FastPathCap+1 rows on
    // the driver. If the limit is hit the codebook is "huge" and the
    // collected prefix is discarded in favor of the distributed path.
    val cRows = centroids
      .select(col(cIdCol).cast("long"), Vectors.toDouble(col(cEmbCol)))
      .limit(FastPathCap + 1)
      .collect()
    if (cRows.isEmpty) {
      // No centroids → no assignments; schema matches the non-empty
      // paths (centroid_id long, centroid_cos double).
      return df.filter(lit(false))
        .select(col(idCol) +: payload.map(col) :+
          lit(null).cast("long").as("centroid_id") :+
          lit(null).cast("double").as("centroid_cos"): _*)
    }
    if (cRows.length <= FastPathCap) {
      val sorted = cRows.sortBy(_.getLong(0))
      val cids = sorted.map(_.getLong(0))
      val cents = sorted.map(_.getSeq[Double](1).toArray)
      val am = graft.functions.CentroidArgmax
        .argmax(col(embCol), cids, cents)
      return df.withColumn("__b", am)
        .select(col(idCol) +: payload.map(col) :+
          col("__b.cid").as("centroid_id") :+
          col("__b.cos").as("centroid_cos"): _*)
    }
    // norms once per vector/centroid, not once per candidate pair —
    // bitwise-identical cosine (see Vectors.cosineWithNorms), 3x
    // fewer dot products in the N×K candidate stage
    val winners = df.select(col(idCol), col(embCol))
      .withColumn("__na", Vectors.norm(col(embCol)))
      .crossJoin(
        broadcast(centroids.select(col(cIdCol).cast("long").as("centroid_id"),
          col(cEmbCol).as("__cemb"),
          Vectors.norm(col(cEmbCol)).as("__cn"))))
      .withColumn("centroid_cos", Vectors.cosineWithNorms(
        col(embCol), col("__cemb"), col("__na"), col("__cn")))
      .groupBy(col(idCol))
      .agg(max(struct(col("centroid_cos").as("centroid_cos"),
        (-col("centroid_id")).as("__ncid"))).as("__b"))
      .select(col(idCol), (-col("__b.__ncid")).as("centroid_id"),
        col("__b.centroid_cos").as("centroid_cos"))
    df.join(winners, idCol)
      .select(col(idCol) +: payload.map(col) :+
        col("centroid_id") :+ col("centroid_cos"): _*)
  }

  /** Embedding-cosine near-duplicate pairs, IVF-blocked: vectors are
    * assigned to their nearest centroid, and only pairs WITHIN a
    * cluster are compared — the all-pairs O(n^2) product becomes
    * sum over clusters of O(n_c^2), the standard blocking trade
    * (recall bounded by assignment quality). Same shape as the LSH
    * band join for text near-dups. */
  def embeddingNearDup(df: DataFrame, idCol: String, embCol: String,
                       centroids: DataFrame, cIdCol: String, cEmbCol: String,
                       threshold: Double): DataFrame = {
    // cached for the same both-sides-of-the-self-join reason as knnJoin
    val assigned = ivfAssign(df, idCol, embCol, centroids, cIdCol, cEmbCol)
      .select(col("centroid_id"), col(idCol), col(embCol))
      .withColumn("__n", Vectors.norm(col(embCol)))
      .cache()
    val a = assigned.select(col("centroid_id"), col(idCol).as("vec_a"),
      col(embCol).as("__ea"), col("__n").as("__na"))
    val b = assigned.select(col("centroid_id"), col(idCol).as("vec_b"),
      col(embCol).as("__eb"), col("__n").as("__nb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", Vectors.cosineWithNorms(col("__ea"), col("__eb"),
        col("__na"), col("__nb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** KNN join, IVF-blocked: every vector's top-k nearest neighbors
    * WITHIN its cluster (the batch-retrieval counterpart of ivfTopK's
    * single query). One cluster-local self-join + rank — sum over
    * clusters of O(n_c^2) work and no global shuffle beyond the
    * centroid key, the shape that survives 100 TB. Recall is bounded
    * by assignment quality exactly as for [[embeddingNearDup]]. */
  def knnJoin(df: DataFrame, idCol: String, embCol: String,
              centroids: DataFrame, cIdCol: String, cEmbCol: String,
              k: Int): DataFrame = {
    // cached: both sides of the self-join read the assignment — without
    // it the centroid crossJoin + rank (the dominant pass) runs twice.
    // One-shot sessions release it with the session; long-lived callers
    // own cleanup (same contract as Dedup.nearDuplicates).
    val assigned = ivfAssign(df, idCol, embCol, centroids, cIdCol, cEmbCol)
      .select(col("centroid_id"), col(idCol), col(embCol))
      .withColumn("__n", Vectors.norm(col(embCol)))
      .cache()
    val a = assigned.select(col("centroid_id"), col(idCol).as("vec_id"),
      col(embCol).as("__ea"), col("__n").as("__na"))
    val b = assigned.select(col("centroid_id"), col(idCol).as("nb_id"),
      col(embCol).as("__eb"), col("__n").as("__nb"))
    // Rank on the 6-dp ROUNDED cosine (nb_id tiebreak): raw cosines
    // agree across engines only to a few ulp, which would flip ranks
    // of near-equal neighbors; rounded values order identically.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nb_id"))
    a.join(b, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("nb_id"))
      .withColumn("cos", round(Vectors.cosineWithNorms(col("__ea"),
        col("__eb"), col("__na"), col("__nb")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("nb_id"), col("cos"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Deterministic ±1 sign for the random-projection matrix — an LCG
    * over the flattened (outDim, inDim) index, fixed and public so any
    * engine reproduces the projection bit-for-bit. */
  def projSign(j: Int, i: Int, inDims: Int): Int = {
    val h = (1103515245L * (j.toLong * inDims + i) + 12345L) % 2147483648L
    // bit 16, not bit 0: an LCG's low bit has period 2, which made
    // every projection row the SAME ±pattern (all output dims
    // identical, all sign-LSH signatures 0x00/0xFF). Higher state
    // bits are well mixed.
    if (((h >> 16) & 1L) == 0L) 1 else -1
  }

  /** Johnson-Lindenstrauss random projection to `outDims` dimensions
    * with a deterministic ±1 matrix, scaled by 1/sqrt(outDims).
    *
    * Each output dim is an UNROLLED left-associated sum of ±x_i — a
    * plain codegen'd arithmetic expression (no higher-order functions,
    * no shuffle; a pure map stage that fuses into whatever reads it).
    * Because sign flips, adds and the final divide are all IEEE
    * correctly-rounded and the association is pinned, the result is
    * bitwise identical in any engine — no rounding needed downstream.
    * Output columns p0..p{outDims-1} (flat doubles, not an array: flat
    * columns keep the result joinable/sortable everywhere).
    */
  def randomProjection(df: DataFrame, embCol: String,
                       inDims: Int, outDims: Int): DataFrame = {
    val scale = math.sqrt(outDims.toDouble)
    val projs = (0 until outDims).map { j =>
      val terms = (0 until inDims).map { i =>
        lit(projSign(j, i, inDims).toDouble) *
          element_at(col(embCol), i + 1).cast("double")
      }
      (terms.reduceLeft(_ + _) / lit(scale)).as(s"p$j")
    }
    df.select(col("*") +: projs: _*).drop(embCol)
  }

  /** Per-dimension int8 scalar quantization: code = floor(255·(x−min)/
    * (max−min)) clamped to [0,255], with the per-dim (min,max) learned
    * from the data. min/max are order-independent aggregates and every
    * arithmetic op is correctly-rounded, so codes are engine-portable
    * without rounding. Long form (id, dim, code): one explode + one
    * tiny (dims-sized, broadcast) stats join — both map-side scalable;
    * the wide re-pack is `groupBy(id).pivot` when a columnar layout is
    * wanted. Degenerate dims (max == min) code to 0. */
  def scalarQuantize(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val long = df.select(col(idCol),
      posexplode(col(embCol)).as(Seq("dim", "__x")))
    val stats = long.groupBy("dim")
      .agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"))
    long.join(broadcast(stats), "dim")
      .select(col(idCol), col("dim").cast("long").as("dim"),
        when(col("__mx") > col("__mn"),
          least(lit(255L), floor(
            (col("__x").cast("double") - col("__mn").cast("double")) /
              (col("__mx").cast("double") - col("__mn").cast("double")) *
              lit(255.0)).cast("long")))
          .otherwise(lit(0L)).as("code"))
  }

  /** IVF search: assign once, then search only rows in the query's
    * cluster(s). At scale the assignment is precomputed and the table
    * is written partitioned by centroid_id → partition pruning makes
    * the probe read only nprobe buckets. */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String,
              centroids: DataFrame, cIdCol: String, cEmbCol: String,
              q: Seq[Double], k: Int, nprobe: Int = 1): DataFrame = {
    val assigned = ivfAssign(df, idCol, embCol, centroids, cIdCol, cEmbCol)
    val qCents = centroids
      .select(col(cIdCol).as("centroid_id"),
        Vectors.cosine(col(cEmbCol), queryLit(q)).as("qcos"))
      .orderBy(col("qcos").desc, col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    assigned.join(broadcast(qCents), Seq("centroid_id"), "left_semi")
      .withColumn("cos", Vectors.cosine(col(embCol), queryLit(q)))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cos"))
  }
}
