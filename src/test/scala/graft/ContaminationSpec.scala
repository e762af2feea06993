package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

/** Decontamination semantics: n-gram windows, hit counting, short-doc
  * and no-overlap behavior. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("tokenNgrams slides distinct n-windows; short docs empty") {
    val df = Seq(
      (1L, "a b c d"),    // 3 bigrams
      (2L, "a b a b"),    // "a b" repeats -> distinct keeps 2
      (3L, "solo")        // shorter than n=2
    ).toDF("id", "text")
    val got = df.select(col("id"),
        Contamination.tokenNgrams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) == Set("a b", "b c", "c d"))
    assert(got(2L) == Set("a b", "b a"))
    assert(got(3L) == Set.empty)
  }

  test("segmentDedup keeps first occurrence globally, reassembles in order") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, Seq("alpha", "beta", "alpha")),  // in-doc dup of "alpha"
      (2L, Seq("beta", "gamma")),           // "beta" already in doc 1
      (3L, Seq.empty[String])               // nothing survives
    ).toDF("doc_id", "segs")
    val got = Dedup.segmentDedup(docs, "doc_id", col("segs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 3L, 2L, "alpha beta"),
      (2L, 2L, 1L, "gamma"),
      (3L, 0L, 0L, "")))
  }

  test("segmentDedup: null segments array behaves as zero segments") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, Some(Seq("x", "y"))),
      (2L, Option.empty[Seq[String]])
    ).toDF("doc_id", "segs")
    val got = Dedup.segmentDedup(docs, "doc_id", col("segs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set((1L, 2L, 2L, "x y"), (2L, 0L, 0L, "")))
  }

  test("flagContaminated counts distinct benchmark-overlapping grams") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // shares 5-grams
      (2L, "an entirely unrelated document about engines"),
      (3L, "tiny doc")                                     // < 5 tokens
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")
    ).toDF("doc_id", "text")
    val got = Contamination
      .flagContaminated(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // Only "the quick brown fox jumps" is shared.
    assert(got == Set((1L, 1L, true), (2L, 0L, false), (3L, 0L, false)))
  }
}
