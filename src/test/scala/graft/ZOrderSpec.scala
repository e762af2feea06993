package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Bit-level goldens for the Morton/Z-order key. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zOrder2 matches the reference bit-interleave on pseudo-random inputs") {
    val pts = (0 until 500).map(i =>
      (((i * 2654435761L) >>> 7) % 1024, ((i * 40503L) >>> 3) % 1024))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zOrder2(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refInterleave(x, y, 10), s"($x,$y)")
    }
  }

  test("zOrder2 is a bijection on the grid (distinct keys stay distinct)") {
    val all = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val n = all.toDF("x", "y")
      .select(ZOrder.zOrder2(col("x"), col("y"), 5).as("z"))
      .distinct().count()
    assert(n == 32L * 32L)
  }

  test("zOrder2 locality: small grid boxes span contiguous-ish z ranges") {
    // The defining property used for row-group skipping: an aligned
    // 2^k x 2^k box is EXACTLY one contiguous z range.
    val box = for (x <- 8L until 16L; y <- 8L until 16L) yield (x, y)
    val zs = box.map { case (x, y) => refInterleave(x, y, 10) }.sorted
    assert(zs.last - zs.head + 1 == 64, "aligned 8x8 box must be one contiguous z run")
  }
}
