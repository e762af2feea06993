package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.Text

/** Dedup operator semantics: exact groups, MinHash signatures, LSH
  * recall on planted near-dups, bucket-size cap, SimHash bit signal. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog!"),   // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"),    // exact dup of 1
    (5L, "zz")                                              // shorter than a 3-gram
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_dups") > 1).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_dups") == 2 && r(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash signature: 12 slots, equal texts get equal signatures") {
    val sig = docs.select(col("doc_id"), Dedup.minHashSignature(col("text")).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sig(1L).length == Dedup.NumHashes)
    assert(sig(1L) == sig(4L))
    assert(sig(1L) != sig(3L))
    assert(sig(5L).forall(_ == Text.P)) // empty gram set -> sentinel
  }

  test("LSH finds planted exact+near dup pairs, skips empty-gram docs") {
    val cands = Dedup.lshCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 4L)))   // identical -> all bands agree
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 4L))) // near-dup collides on some band
    assert(!cands.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("near-dup pipeline: jaccard verification separates near from far") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(nd.exists(t => t._1 == 1L && t._2 == 4L && t._3 == 1.0))
    assert(nd.forall(t => t._3 >= 0.8))
    assert(!nd.exists(t => t._2 == 3L || t._1 == 3L))
  }

  test("bucket cap drops degenerate mega-buckets") {
    val many = (1L to 30L).map(i => (i, "identical boilerplate text body"))
      .toDF("doc_id", "text")
    val capped = Dedup.lshCandidates(many, "doc_id", "text", maxBucket = 10)
    assert(capped.count() == 0)  // single bucket of 30 > cap -> dropped
    val uncapped = Dedup.lshCandidates(many, "doc_id", "text", maxBucket = 1000)
    assert(uncapped.count() == 30L * 29 / 2)
  }

  test("ngram jaccard: identity 1, disjoint 0, symmetric") {
    val r = spark.range(1).select(
      Dedup.ngramJaccard(lit("abcdef"), lit("abcdef")).as("same"),
      Dedup.ngramJaccard(lit("aaaa"), lit("zzzz")).as("disj"),
      Dedup.ngramJaccard(lit("abcd"), lit("bcde")).as("ab"),
      Dedup.ngramJaccard(lit("bcde"), lit("abcd")).as("ba")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    assert(approx(r.getDouble(2), r.getDouble(3)))
  }

  test("simhash: equal texts equal, all 32 bits carry signal across corpus") {
    // Token-disjoint ALPHABETIC docs (normalizeAz strips digits, so
    // numeric-suffixed tokens would all collapse to one word; and
    // shared tokens would push every doc's bit votes the same way).
    val rng = new scala.util.Random(3)
    def word() = (0 until 6).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val texts = (0 until 200).map(i => (i.toLong,
      (0 until 8).map(_ => word()).mkString(" ")))
      .toDF("doc_id", "text")
    val hs = texts.select(Dedup.simHash32(col("text")).as("h"))
      .as[Long].collect()
    // every bit 0..31 must vary somewhere in a 200-doc corpus
    for (b <- 0 until 32) {
      val ones = hs.count(h => ((h >> b) & 1L) == 1L)
      assert(ones > 0 && ones < hs.length, s"bit $b constant")
    }
    val pair = Seq((1L, "same text here"), (2L, "same text here"))
      .toDF("doc_id", "text")
      .select(Dedup.simHash32(col("text")).as("h")).as[Long].collect()
    assert(pair(0) == pair(1))
  }
}
