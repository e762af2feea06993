package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{AzNgramCodesSorted, SortedIntMultisetIntersectCount}

/** Kernels behind the t_chrf doc-grain plan: the fused
  * normalize→codes→sort expression must equal the Spark-native chain
  * it replaced, and the two-pointer multiset intersect must equal a
  * brute Σ_g min(count_a, count_b) — both checked over randomized
  * inputs (seeded) plus the edge cases that bit the shuffle shapes.
  */
class ChrfKernelSpec extends SparkSpec {
  import spark.implicits._

  private def bruteCodes(text: String, n: Int): Seq[Int] = {
    val az = text.toLowerCase.filter(c => c >= 'a' && c <= 'z')
    if (az.length < n) Seq.empty
    else az.sliding(n).map(_.foldLeft(0)((a, c) => a * 31 + c)).toSeq.sorted
  }

  private def bruteClip(a: Seq[Int], b: Seq[Int]): Long = {
    val ca = a.groupBy(identity).view.mapValues(_.size)
    val cb = b.groupBy(identity).view.mapValues(_.size).toMap
    ca.map { case (g, c) => math.min(c, cb.getOrElse(g, 0)).toLong }.sum
  }

  test("AzNgramCodesSorted equals the Spark-native normalize+codes+sort chain") {
    val rng = new scala.util.Random(7)
    val alphabet = "abcdefghij XYZ.,!7 "
    val texts = (1 to 60).map(i =>
      (i.toLong, (0 until rng.nextInt(120)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString)) :+
      (901L, "") :+ (902L, "a") :+ (903L, "ab") :+ (904L, "  ..!! ") :+
      (905L, "zz") :+ (906L, "abc")
    val df = texts.toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val got = df.select(col("id"),
        AzNgramCodesSorted.azNgramCodesSorted(col("text"), n).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      texts.foreach { case (id, t) =>
        assert(got(id) == bruteCodes(t, n), s"id=$id n=$n text='$t'")
      }
    }
  }

  test("AzNgramCodesSorted never mutates the source row (getBytes aliasing)") {
    // two references to the SAME string column in one projection:
    // if the kernel compacted in place, the second evaluation (and
    // the emitted text) would see corrupted bytes
    val df = Seq((1L, "The Quick... Brown Fox!")).toDF("id", "text")
      .select(col("text"),
        AzNgramCodesSorted.azNgramCodesSorted(col("text"), 2).as("c2"),
        AzNgramCodesSorted.azNgramCodesSorted(col("text"), 3).as("c3"))
    val r = df.collect().head
    assert(r.getString(0) == "The Quick... Brown Fox!")
    assert(r.getSeq[Int](1) == bruteCodes("The Quick... Brown Fox!", 2))
    assert(r.getSeq[Int](2) == bruteCodes("The Quick... Brown Fox!", 3))
  }

  test("SortedIntMultisetIntersectCount equals brute multiset min-sum") {
    val rng = new scala.util.Random(11)
    val pairs = (1 to 80).map { i =>
      def arr() = Seq.fill(rng.nextInt(40))(rng.nextInt(8)).sorted
      (i.toLong, arr(), arr())
    } :+ (900L, Seq.empty[Int], Seq(1, 2)) :+
      (901L, Seq(1, 1, 1), Seq(1, 1)) :+ (902L, Seq(5), Seq(5))
    val df = pairs.toDF("id", "a", "b").select(col("id"),
      SortedIntMultisetIntersectCount.sortedMultisetIntersectCount(
        col("a"), col("b")).as("c"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (id, a, b) =>
      assert(got(id) == bruteClip(a, b), s"id=$id a=$a b=$b")
    }
  }

  test("kernel matches interpreted eval (codegen parity)") {
    val s = UTF8String.fromString("hello world, HELLO!")
    for (n <- Seq(2, 3)) {
      val arr = AzNgramCodesSorted.codes(s, n)
      val exp = bruteCodes("hello world, HELLO!", n)
      assert(arr.toIntArray().toSeq == exp, s"n=$n")
    }
  }
}
