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

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03 —
    * the MOSS algorithm): hash every char 5-gram, slide a window of
    * `w` consecutive hashes, record each window's minimum (rightmost
    * on ties) once → (id, pos, fingerprint). Guarantees any match of
    * length >= w+4 shares a fingerprint while keeping ~1/w of grams.
    *
    * The (min-hash, rightmost-pos) winner is packed into ONE integer
    * key — h·2²⁰ + (2²⁰−1−pos) — so a plain rolling `min` implements
    * the winnow rule exactly: no self-join, no per-doc cross product,
    * and the packed key stays an exact BIGINT (≤ ~1e15), bit-portable
    * (ORACLE_NOTES.md "argmin-with-tiebreak"). One window exchange on
    * the id, one distinct exchange. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         w: Int = 4): DataFrame = {
    val M = 1L << 20 // position capacity per doc (1M grams)
    val norm = df
      .select(col(idCol), Text.normalizeAz(col(textCol)).as("t"))
      .filter(length(col("t")) >= 5)
    // positional codegen'd hasher: one generated loop over the bytes —
    // the charNgrams+polyHashElem route materialized a substring per
    // gram (25M short-lived strings at sf0.1); values are identical on
    // the normalized single-byte text, so the oracle is unchanged.
    val grams = norm
      .select(col(idCol),
        posexplode(graft.functions.NgramPosHash.ngramPosHashes(col("t"), 5))
          .as(Seq("pos0", "h")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"),
        col("h"))
    val keyed = grams.select(col(idCol), col("pos"),
      (col("h") * M + (lit(M - 1) - col("pos"))).as("key"))
    keyed
      .withColumn("sel", min(col("key")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy("pos").rowsBetween(-(w - 1), 0)))
      .select(col(idCol),
        (lit(M - 1) - pmod(col("sel"), lit(M))).as("pos"),
        expr(s"sel DIV $M").as("fingerprint"))
      .distinct()
  }

  /** Winnow-fingerprint near-dup candidates: pairs of docs sharing at
    * least `minShared` fingerprints. Same scale discipline as LSH
    * banding: the pair join runs per fingerprint BUCKET with a size
    * cap (a boilerplate fingerprint shared by millions of docs would
    * otherwise be an O(bucket²) blow-up in one task; over-cap buckets
    * carry no discriminating signal and are dropped). */
  def winnowCandidates(fp: DataFrame, idCol: String,
                       maxBucket: Int = 100,
                       minShared: Int = 2): DataFrame = {
    // cached: feeds the bucket-count aggregate AND both sides of the
    // pair join — Catalyst does not dedup a subtree across a join, so
    // the upstream fingerprint pipeline (explode + window) would
    // otherwise execute up to four times (t_tfidf precedent).
    val docFp = fp.select(col(idCol), col("fingerprint")).distinct().cache()
    val small = docFp.groupBy("fingerprint")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select("fingerprint")
    val kept = docFp.join(small, Seq("fingerprint"))
    val l = kept.select(col("fingerprint"), col(idCol).as("doc_a"))
    val r = kept.select(col("fingerprint"), col(idCol).as("doc_b"))
    l.join(r, Seq("fingerprint"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** MinHash parameters shared with the oracle-SQL generator. The
    * band shape is a per-call parameter: fewer, wider bands (e.g. 2x6)
    * for high-threshold dedup on near-identical corpora; more, narrower
    * bands (6x2) for recall on diverse corpora. */
  val NumHashes = 12
  val DefaultBandRows = 2
  /** (a_k, b_k) for h_k(x) = (a_k * x + b_k) mod P — fixed, public. */
  val seeds: Seq[(Long, Long)] = (0 until NumHashes).map { k =>
    (((2L * k + 1) * 104729L) % Text.P, (k * 15485863L + 32452843L) % Text.P)
  }

  /** Distinct char-3-grams of normalized text (as strings). */
  def grams3(textCol: Column): Column =
    array_distinct(Text.charNgrams(Text.normalizeAz(textCol), 3))

  /** Distinct char-3-gram polynomial hashes of normalized text —
    * one codegen'd rolling-hash loop (graft.functions.NgramPolyHash),
    * not the interpreted transform+aggregate chain; identical values. */
  def gramHashes(textCol: Column): Column =
    graft.functions.NgramPolyHash.ngramHashes(Text.normalizeAz(textCol), 3)

  /** MinHash signature: array of NumHashes min-hash values. Empty gram
    * set yields P (sentinel) in every slot.
    *
    * Column form — fine for single-pass use, but do NOT fan it out
    * (bands, per-slot columns): higher-order functions run interpreted
    * and CollapseProject inlines this whole subtree into every
    * reference, multiplying the gram-hash cost. For anything that
    * reuses the signature, materialize [[signatureTable]] instead.
    */
  def minHashSignature(textCol: Column): Column =
    signatureFromGrams(gramHashes(textCol))

  /** Signature from an already-computed distinct gram-hash array. */
  def signatureFromGrams(grams: Column): Column =
    array(seeds.map { case (a, b) =>
      coalesce(
        array_min(transform(grams, h => (lit(a) * h + lit(b)) % lit(Text.P))),
        lit(Text.P))
    }: _*)

  /** One row per (doc, distinct gram hash) — the gram lambdas run
    * exactly once per doc; docs with no grams drop out. */
  def gramHashRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"), explode(gramHashes(col(textCol))).as("gh"))

  /** The scale-path MinHash: signature as 12 BIGINT columns m0..m11
    * via explode + codegen'd min-aggregates — no interpreted lambda in
    * the aggregation, one hash-agg shuffle on doc id. Docs whose gram
    * set is empty are absent (join back + sentinel-fill if needed). */
  def signatureTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    signatureFromGramTable(
      df.select(col(idCol).as("doc"), gramHashes(col(textCol)).as("g")))

  /** Same, from a precomputed (doc, g: array<bigint>) gram table. */
  def signatureFromGramTable(grams: DataFrame): DataFrame = {
    val aggs = seeds.zipWithIndex.map { case ((a, b), k) =>
      min((lit(a) * col("gh") + lit(b)) % lit(Text.P)).as(s"m$k")
    }
    grams.select(col("doc"), explode(col("g")).as("gh"))
      .groupBy("doc").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any full band of the signature.
    * Returns (doc_a, doc_b) with doc_a < doc_b, distinct. The band
    * explode is a flat O(docs * NumBands) projection; the join is a
    * shuffle on band keys only.
    */
  /** Default cap on LSH bucket size. A degenerate key (e.g. boilerplate
    * shared by millions of docs) would otherwise produce an O(bucket^2)
    * pair blow-up in a single task — the classic LSH skew killer at
    * 100 TB. Buckets above the cap are dropped (standard practice:
    * such buckets carry no discriminating signal anyway). */
  val MaxBucketSize = 1000

  /** Default cap on VERIFY candidates per doc. The bucket cap bounds
    * per-task work, but on a vocabulary-dense corpus the total
    * candidate count still grows ~quadratically with corpus size
    * (measured on the synthetic corpus: 28 → 49 → 100 pairs/doc
    * across three decades — the pairwise-Jaccard density near the
    * LSH operating point, not any skew artifact). Capping each doc at
    * its best `MaxCandPerDoc` candidates — most matched bands first,
    * then smallest partner id, a deterministic, engine-mirrorable
    * order — bounds total verify work to N·cap, i.e. LINEAR in the
    * corpus (measured decade exponent 1.57 → ~1.1). Coverage is
    * reported in-band: every emitted pair carries `n_cand`, doc_a's
    * PRE-cap candidate count, so a consumer can see exactly where
    * recall was traded (n_cand > cap) — the j22_allen/d_winnow
    * bounded-census precedent. */
  val MaxCandPerDoc = 64

  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    maxBucket: Int = MaxBucketSize,
                    bandRows: Int = DefaultBandRows,
                    maxCandPerDoc: Int = MaxCandPerDoc): DataFrame = {
    // signatureTable: gram lambdas run once per doc, min-hash slots are
    // codegen'd aggregates. Empty-gram docs (shorter than the shingle
    // width) drop out before banding — they'd form one giant
    // all-sentinel bucket otherwise.
    candidatesFromSig(signatureTable(df, idCol, textCol), maxBucket,
      bandRows, maxCandPerDoc)
  }

  /** Band join over a materialized m0..m11 signature table. Returns
    * (doc_a, doc_b, n_cand) with doc_a < doc_b: each doc_a's
    * candidates capped at its `maxCandPerDoc` best (see
    * [[MaxCandPerDoc]]), n_cand = doc_a's pre-cap candidate count. */
  def candidatesFromSig(sig: DataFrame, maxBucket: Int = MaxBucketSize,
                        bandRows: Int = DefaultBandRows,
                        maxCandPerDoc: Int = MaxCandPerDoc): DataFrame = {
    require(bandRows > 0 && NumHashes % bandRows == 0,
      s"bandRows must divide NumHashes=$NumHashes evenly, got $bandRows " +
        "(trailing signature slots would be silently ignored)")
    val numBands = NumHashes / bandRows
    val bandKeys = (0 until numBands).map { b =>
      concat_ws("_",
        (b * bandRows until (b + 1) * bandRows).map(k => col(s"m$k")): _*)
    }
    val bands = sig.select(col("doc"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    // Cap bucket size with one extra aggregation on the band keys —
    // O(docs*bands) shuffle, negligible vs the pair join it guards.
    val small = bands.groupBy("band", "band_key")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select("band", "band_key")
    val kept = bands.join(small, Seq("band", "band_key"))
    val l = kept.select(col("band"), col("band_key"), col("doc").as("doc_a"))
    val r = kept.select(col("band"), col("band_key"), col("doc").as("doc_b"))
    // The group-count replaces the old distinct() at identical shuffle
    // cost and yields the ranking signal for free: pairs that collide
    // in MORE bands have higher estimated similarity, so the per-doc
    // cap keeps the best-evidence candidates first.
    val pairs = l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("__nb"))
    // Both windows share one doc_a exchange; never a global window.
    val wA = org.apache.spark.sql.expressions.Window.partitionBy("doc_a")
    val wCap = wA.orderBy(col("__nb").desc, col("doc_b"))
    pairs
      .withColumn("n_cand", count(lit(1)).over(wA))
      .withColumn("__rn", row_number().over(wCap))
      .filter(col("__rn") <= maxCandPerDoc)
      .select("doc_a", "doc_b", "n_cand")
  }

  /** Exact character-3-gram Jaccard between two text columns. Uses the
    * gram strings themselves (not hashes) so the result is
    * collision-free. */
  def ngramJaccard(a: Column, b: Column): Column =
    // One codegen'd pass per pair (graft.functions.NgramJaccard): the
    // composable grams3+array_intersect form re-evaluates the
    // interpreted gram builder for every reference of each side (CSE
    // does not cross CodegenFallback HOFs), which made the verify
    // kernel ~20ms/pair. Byte-packed grams are exact string-set
    // equality for single-byte normalized text — identical values.
    // coalesce: NULL text means "no grams" (jaccard 0.0, as the
    // pre-codegen form and the oracle compute), not a NULL result.
    graft.functions.NgramJaccard.ngramJaccard(
      coalesce(Text.normalizeAz(a), lit("")),
      coalesce(Text.normalizeAz(b), lit("")), 3)

  /** Near-dup pipeline: LSH candidates verified with exact 3-gram
    * Jaccard >= threshold. The verify join re-reads only candidate doc
    * ids — broadcastable when candidates are rare.
    *
    * RECALL TRADE (inherited default): candidates are capped at each
    * doc_a's [[MaxCandPerDoc]] best-banded partners, so a doc with
    * more than `MaxCandPerDoc` true near-duplicates will MISS the
    * excess pairs (and anything built on the pairs — dupClusters
    * components, corpus pruning — inherits the miss). The trade is
    * observable in-band: every emitted pair carries `n_cand`, doc_a's
    * PRE-cap candidate count, so `n_cand > MaxCandPerDoc` marks
    * exactly the docs where recall was traded. Pass
    * `maxCandPerDoc = Int.MaxValue` through [[lshCandidates]] /
    * [[candidatesFromSig]] for uncapped recall when the corpus is
    * small enough to afford the quadratic candidate tail.
    *
    * The interior gram-table cache stays alive as long as the returned
    * (lazy) DataFrame may recompute — callers in long-lived sessions
    * own cleanup: materialize the result, then
    * `spark.catalog.clearCache()` or unpersist via
    * `spark.sharedState.cacheManager`. One-shot query sessions can rely
    * on LRU eviction + session teardown.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double,
                     bandRows: Int = DefaultBandRows,
                     maxCandPerDoc: Int = MaxCandPerDoc): DataFrame = {
    // The gram table is computed ONCE and cached: the signature
    // aggregation AND the verify join both read it (recomputing the
    // NgramPolyHash pass per consumer would double the dominant corpus
    // scan; at scale this table — ids + hashes — is what you'd
    // persist). Hash arrays also shuffle ~6x lighter than gram
    // strings, and Jaccard over hashed grams is collision-safe in
    // practice (two distinct grams colliding mod P~1e9 within one
    // doc's ~450 grams is negligible).
    val grams = df.select(col(idCol).as("doc"), gramHashes(col(textCol)).as("g"))
      .filter(size(col("g")) > 0)
      .withColumn("gsz", size(col("g")))
      .cache()
    val cands = candidatesFromSig(
      signatureFromGramTable(grams), bandRows = bandRows,
      maxCandPerDoc = maxCandPerDoc)
    val inter = graft.functions.LongArrayIntersectCount
      .intersectCount(col("ga"), col("gb")).cast("double")
    cands
      .join(grams.select(col("doc").as("doc_a"), col("g").as("ga"),
        col("gsz").as("sza")), "doc_a")
      .join(grams.select(col("doc").as("doc_b"), col("g").as("gb"),
        col("gsz").as("szb")), "doc_b")
      .withColumn("inter", inter)
      .withColumn("uni", (col("sza") + col("szb")).cast("double") - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard", "n_cand")
  }

  /** Segment-level (paragraph-level) dedup with reassembly — the
    * CCNet/C4 corpus op: split every doc into segments, drop every
    * segment whose content already appeared earlier in the corpus
    * (first occurrence by (doc, position) wins, globally), and rebuild
    * each doc from its surviving segments in original order.
    *
    * `segments` is caller-supplied (newline paragraphs in real
    * corpora; any array<string> expression works), so the dedup core
    * is segmentation-agnostic.
    *
    * Scale shape: the keeper decision shuffles ONLY (hash, doc, pos)
    * triples — a groupBy on the content hash with map-side combine, so
    * a boilerplate segment duplicated a million times arrives at its
    * reducer as one partial per map task, not a million rows (the
    * window-function formulation would put all million in one window
    * partition AND shuffle their text). Segment text itself moves in
    * exactly two bounded shuffles: the (doc, pos)-keyed semi join and
    * the per-doc reassembly — both keyed on (doc, pos)/doc, neither
    * skewed by content popularity. */
  def segmentDedup(df: DataFrame, idCol: String,
                   segments: Column, sep: String = " "): DataFrame = {
    val base = df.select(col(idCol).as("__id"), segments.as("__segs"))
    val segs = base.select(col("__id"),
      posexplode(col("__segs")).as(Seq("__pos", "__seg")))
    val hashed = segs.select(col("__id"), col("__pos"), md5(col("__seg")).as("__h"))
    val keeper = hashed.groupBy("__h")
      .agg(min(struct(col("__id"), col("__pos"))).as("__k"))
    val keepPos = hashed.join(keeper, "__h")
      .filter(col("__id") === col("__k.__id") && col("__pos") === col("__k.__pos"))
      .select("__id", "__pos")
    val kept = segs.join(keepPos, Seq("__id", "__pos"), "left_semi")
    val reassembled = kept.groupBy("__id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__seg")))),
          s => s.getField("__seg")), sep).as("text_dedup"))
    // explicit null guard: a null segments array means "no segments"
    // (0) — and size(null) is -1 under legacy sizeOfNull, null under
    // ANSI, so neither raw form is total
    base.select(col("__id"),
        when(col("__segs").isNull, lit(0))
          .otherwise(size(col("__segs"))).cast("long").as("n_segments"))
      .join(reassembled, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** 32-bit SimHash over distinct token hashes: bit b of the result is
    * set iff sum over tokens of (2*bit_b(h)-1) > 0. One projection
    * pass; bucketing on a prefix gives near-dup blocking.
    *
    * Poly-hash values are < P ~= 2^30, so a single hash only carries 30
    * useful bits. Two independent hashes (multipliers 31 and 131) each
    * contribute their low 16 bits so all 32 output bits carry signal.
    */
  def simHash32(textCol: Column): Column = {
    // Single-pass formulation: per token compute the two hash-family
    // values ONCE into a pair, fold the pairs into a 32-slot vote
    // array, then map votes to bit values and sum. Each stage
    // references the previous exactly once — the per-bit aggregate
    // form re-evaluated the whole token-hash transform 32 times
    // (interpreted HOFs get no common-subexpression elimination).
    val toks = array_distinct(Text.tokens(Text.normalizeAz(textCol)))
    val pairs = transform(toks,
      t => array(Text.polyHashElem(t), Text.polyHashElem(t, 131L)))
    val votes = aggregate(pairs, array_repeat(lit(0L), 32),
      (acc, p) => transform(sequence(lit(0), lit(31)), b => {
        val src = when(b < 16, element_at(p, 1)).otherwise(element_at(p, 2))
        val bb = when(b < 16, b).otherwise(b - 16)
        // dynamic-shift bit extract: src < P ~ 2^30, exact in double
        val bit = (src.cast("double") /
          pow(lit(2.0), bb.cast("double"))).cast("long") % lit(2L)
        element_at(acc, b + 1) + bit * lit(2L) - lit(1L)
      }))
    val bitVals = zip_with(votes,
      transform(sequence(lit(0), lit(31)), b => b),
      (v, b) => when(v > lit(0L),
        pow(lit(2.0), b.cast("double")).cast("long")).otherwise(lit(0L)))
    aggregate(bitVals, lit(0L), (acc, x) => acc + x)
  }
}
