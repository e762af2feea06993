package graft

import org.apache.spark.sql.functions._
import graft.functions.{NgramPolyHash, Text}

/** The codegen'd gram hasher must equal the composable interpreted
  * formula exactly (it feeds the same DuckDB oracle). */
class NgramPolyHashSpec extends SparkSpec {
  import spark.implicits._

  private def slowGramHashes(c: org.apache.spark.sql.Column) =
    array_distinct(transform(Text.charNgrams(c, 3), g => Text.polyHashElem(g)))

  test("codegen == interpreted formula on random alpha strings") {
    val rng = new scala.util.Random(13)
    val strs = (0 until 300).map { i =>
      (0 until rng.nextInt(60)).map(_ =>
        if (rng.nextInt(6) == 0) ' ' else ('a' + rng.nextInt(26)).toChar).mkString
    }
    val df = strs.toDF("t")
    val bad = df.select(
      NgramPolyHash.ngramHashes(col("t"), 3).as("fast"),
      slowGramHashes(col("t")).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(bad == 0)
  }

  test("edge cases: empty, shorter than n, exactly n") {
    val r = spark.range(1).select(
      NgramPolyHash.ngramHashes(lit(""), 3).as("e"),
      NgramPolyHash.ngramHashes(lit("ab"), 3).as("s"),
      NgramPolyHash.ngramHashes(lit("abc"), 3).as("x")).head()
    assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty)
    val h = ((('a'.toLong * 31 + 'b') % Text.P) * 31 + 'c') % Text.P
    assert(r.getSeq[Long](2) == Seq(h))
  }

  test("distinct: repeated grams hash once, first-occurrence order") {
    val r = spark.range(1).select(
      NgramPolyHash.ngramHashes(lit("abcabc"), 3).as("g")).head()
    // grams: abc bca cab abc -> distinct 3
    assert(r.getSeq[Long](0).length == 3)
  }

  test("LongArrayIntersectCount == size(array_intersect) on distinct arrays") {
    val rng = new scala.util.Random(31)
    val rows = (0 until 300).map { _ =>
      (Seq.fill(rng.nextInt(50))(rng.nextInt(80).toLong).distinct,
        Seq.fill(rng.nextInt(50))(rng.nextInt(80).toLong).distinct)
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
      graft.functions.LongArrayIntersectCount
        .intersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("CdcBoundaries == the composable zip_with chain on random strings") {
    import graft.functions.CdcBoundaries
    val P = Text.P
    val rng = new scala.util.Random(29)
    val strs = (0 until 200).map { _ =>
      (0 until rng.nextInt(400)).map(_ =>
        if (rng.nextInt(6) == 0) ' ' else ('a' + rng.nextInt(26)).toChar)
        .mkString
    }
    val df = strs.toDF("t")
    // the pre-round-8 composable formulation, verbatim
    val cs = transform(filter(split(col("t"), ""),
      ch => length(ch) > lit(0)), ch => ascii(ch).cast("long"))
    val m = greatest(size(cs) - lit(7), lit(0))
    val rolled = (2 to 8).foldLeft(
      transform(slice(cs, lit(1), m), x => pmod(x, lit(P)))) { (acc, k) =>
      zip_with(acc, slice(cs, lit(k), m),
        (a, b) => pmod(a * 31L + b, lit(P)))
    }
    val hashes = when(size(cs) >= 8, rolled)
      .otherwise(array().cast("array<long>"))
    val bounds = filter(hashes, h => pmod(h, lit(64L)) === 0L)
    val b = CdcBoundaries.boundaries(col("t"), 8, 64L)
    val bad = df.select(
      b.getField("n_bounds").as("fastN"),
      b.getField("sig").as("fastS"),
      size(bounds).cast("long").as("slowN"),
      pmod(aggregate(bounds, lit(0L), (a, x) => a + pmod(x, lit(P))),
        lit(P)).as("slowS"))
      .filter(col("fastN") =!= col("slowN") ||
        col("fastS") =!= col("slowS")).count()
    assert(bad == 0)
  }

  test("null input yields null") {
    val r = spark.range(1).select(
      NgramPolyHash.ngramHashes(lit(null).cast("string"), 3).as("g")).head()
    assert(r.isNullAt(0))
  }
}
