package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-image-decode checks: the javax.imageio kernel must recover the
  * exact pixel values a lossless PNG round-trip preserves, and corrupt
  * blobs must degrade to null metadata instead of failing the scan. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def analyticSums(seed: Long, w: Int, h: Int): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += (seed + 7L * x + 13L * y) % 256
      sg += (3L * seed + 5L * x + 11L * y) % 256
      sb += (5L * seed + 3L * x + 17L * y) % 256
    }
    (sr, sg, sb)
  }

  test("PNG encode -> imageio decode recovers exact analytic pixel sums") {
    val cases = Seq((0L, 8, 8), (17L, 23, 9), (499L, 16, 24))
    val df = cases.map { case (seed, w, h) =>
      (seed, Multimodal.syntheticPng(seed, w, h))
    }.toDF("seed", "payload")
    val got = Multimodal.decodeImageStats(df, "payload")
      .orderBy("seed")
      .select("seed", "img_w", "img_h", "channels", "sum_r", "sum_g", "sum_b")
      .collect()
    cases.sortBy(_._1).zip(got).foreach { case ((seed, w, h), row) =>
      val (sr, sg, sb) = analyticSums(seed, w, h)
      assert(row.getInt(1) == w && row.getInt(2) == h)
      assert(row.getInt(3) == 3)
      assert(row.getLong(4) == sr, s"sum_r seed=$seed")
      assert(row.getLong(5) == sg, s"sum_g seed=$seed")
      assert(row.getLong(6) == sb, s"sum_b seed=$seed")
    }
  }

  test("undecodable and null payloads yield null metadata, not a failure") {
    // id 5: a recognized-but-corrupt body — valid PNG magic, truncated
    // stream. ImageIO.read THROWS here (vs returning null for id 1's
    // missing magic); both must degrade to the null-metadata row.
    val truncated = Multimodal.syntheticPng(5L, 8, 8).take(40)
    val df = Seq(
      (1L, "not an image at all".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, Multimodal.syntheticPng(3L, 8, 8)),
      (5L, truncated))
      .toDF("id", "payload")
      // a genuinely null payload cell too
      .union(Seq((4L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload"))
    val got = Multimodal.decodeImageStats(df, "payload")
      .orderBy("id").select("id", "img_w", "sum_r").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(!got(2).isNullAt(1) && got(2).getInt(1) == 8)
    assert(got(3).isNullAt(1) && got(3).isNullAt(2), "null payload")
    assert(got(4).isNullAt(1) && got(4).isNullAt(2), "truncated PNG")
  }
}
