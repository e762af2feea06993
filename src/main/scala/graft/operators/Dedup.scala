package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for the large-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Design for 100 TB: nothing here ever builds an all-pairs product.
  *  - exact: single hash-groupBy shuffle.
  *  - MinHash LSH: signatures are computed in one codegen'd projection
  *    pass; candidate pairs come from a groupBy on (band, bandKey) so
  *    the shuffle volume is O(docs * bands), not O(docs^2); exact
  *    verification runs only on candidates.
  *  - SimHash: one projection pass + a groupBy on the bucket prefix.
  *
  * All hashing is the engine-portable polynomial hash (Text.polyHash)
  * so the DuckDB oracle reproduces signatures bit-for-bit.
  */
object Dedup {

  /** Exact dedup via content hash: one row per distinct content with
    * the canonical keeper id and the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** MinHash parameters shared with the oracle-SQL generator. */
  val NumHashes = 12
  val BandRows = 2
  val NumBands: Int = NumHashes / BandRows
  /** (a_k, b_k) for h_k(x) = (a_k * x + b_k) mod P — fixed, public. */
  val seeds: Seq[(Long, Long)] = (0 until NumHashes).map { k =>
    (((2L * k + 1) * 104729L) % Text.P, (k * 15485863L + 32452843L) % Text.P)
  }

  /** Distinct char-3-grams of normalized text (as strings). */
  def grams3(textCol: Column): Column =
    array_distinct(Text.charNgrams(Text.normalizeAz(textCol), 3))

  /** Distinct char-3-gram polynomial hashes of normalized text. */
  def gramHashes(textCol: Column): Column =
    array_distinct(transform(Text.charNgrams(Text.normalizeAz(textCol), 3),
      g => Text.polyHashElem(g)))

  /** MinHash signature: array of NumHashes min-hash values. Empty gram
    * set yields P (sentinel) in every slot. */
  def minHashSignature(textCol: Column): Column = {
    val grams = gramHashes(textCol)
    array(seeds.map { case (a, b) =>
      coalesce(
        array_min(transform(grams, h => (lit(a) * h + lit(b)) % lit(Text.P))),
        lit(Text.P))
    }: _*)
  }

  /** LSH candidate pairs: docs sharing any full band of the signature.
    * Returns (doc_a, doc_b) with doc_a < doc_b, distinct. The band
    * explode is a flat O(docs * NumBands) projection; the join is a
    * shuffle on band keys only.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = df.select(col(idCol).as("doc"), minHashSignature(col(textCol)).as("sig"))
    val bands = sig.select(col("doc"), posexplode(
      transform(sequence(lit(0), lit(NumBands - 1)),
        b => array_join(transform(
          slice(col("sig"), b * lit(BandRows) + lit(1), lit(BandRows)),
          x => x.cast("string")), "_"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val l = bands.select(col("band"), col("band_key"), col("doc").as("doc_a"))
    val r = bands.select(col("band"), col("band_key"), col("doc").as("doc_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact character-3-gram Jaccard between two text columns. Uses the
    * gram strings themselves (not hashes) so the result is
    * collision-free. */
  def ngramJaccard(a: Column, b: Column): Column = {
    val ga = grams3(a)
    val gb = grams3(b)
    val inter = size(array_intersect(ga, gb)).cast("double")
    val uni = (size(ga) + size(gb)).cast("double") - inter
    when(uni > lit(0.0), inter / uni).otherwise(lit(0.0))
  }

  /** Near-dup pipeline: LSH candidates verified with exact 3-gram
    * Jaccard >= threshold. The verify join re-reads only candidate doc
    * ids — broadcastable when candidates are rare.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("doc"), col(textCol).as("txt"))
    val cands = lshCandidates(df, idCol, textCol)
    cands
      .join(docs.withColumnRenamed("doc", "doc_a").withColumnRenamed("txt", "txt_a"), "doc_a")
      .join(docs.withColumnRenamed("doc", "doc_b").withColumnRenamed("txt", "txt_b"), "doc_b")
      .withColumn("jaccard", ngramJaccard(col("txt_a"), col("txt_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 32-bit SimHash over distinct token hashes: bit b of the result is
    * set iff sum over tokens of (2*bit_b(h)-1) > 0. One projection
    * pass; bucketing on a prefix gives near-dup blocking. */
  def simHash32(textCol: Column): Column = {
    val hashes = array_distinct(transform(Text.tokens(Text.normalizeAz(textCol)),
      t => Text.polyHashElem(t)))
    val bits = (0 until 32).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % lit(2L)) * lit(2L) - lit(1L))
      when(vote > lit(0L), lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
