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

  test("PCM encode -> decode recovers exact analytic amplitude stats") {
    val cases = Seq((0L, 500), (17L, 977), (499L, 1460))
    val df = cases.map { case (seed, n) =>
      (seed, Multimodal.syntheticPcm(seed, n))
    }.toDF("seed", "payload")
    val got = Multimodal.decodePcmStats(df, "payload")
      .orderBy("seed")
      .select("seed", "n_samples", "sum_abs", "peak", "n_clipped")
      .collect()
    cases.sortBy(_._1).zip(got).foreach { case ((seed, n), row) =>
      val vals = (0 until n).map(i =>
        math.abs(((seed * 31L + i * 37L) % 4001L - 2000L).toInt))
      assert(row.getInt(1) == n)
      assert(row.getLong(2) == vals.map(_.toLong).sum, s"sum_abs seed=$seed")
      assert(row.getInt(3) == vals.max, s"peak seed=$seed")
      assert(row.getLong(4) == vals.count(_ >= 1900).toLong, s"clip seed=$seed")
    }
  }

  test("torn (odd-length) and null PCM payloads yield null metadata") {
    val torn = Multimodal.syntheticPcm(7L, 100).dropRight(1)
    val df = Seq((1L, torn), (2L, Multimodal.syntheticPcm(2L, 10)))
      .toDF("id", "payload")
      .union(Seq((3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload"))
    val got = Multimodal.decodePcmStats(df, "payload")
      .orderBy("id").select("id", "n_samples", "sum_abs").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2), "torn payload")
    assert(!got(1).isNullAt(1) && got(1).getInt(1) == 10)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2), "null payload")
  }

  test("dHash: flat image all-zero, gradient all-one, self-hamming 0") {
    def flat(v: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def grad(w: Int, h: Int): Array[Byte] = {
      // gray strictly increases with x -> every right cell mean beats
      // its left neighbor -> all 64 bits set
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = x * 255 / (w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq((1L, flat(128, 18, 16)), (2L, grad(18, 16)),
      (3L, flat(128, 18, 16)), (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val got = Multimodal.decodeImageDHash(df, "payload")
      .orderBy("id").select("id", "dhash_hi", "dhash_lo").collect()
    assert(got(0).getLong(1) == 0L && got(0).getLong(2) == 0L, "flat")
    assert(got(1).getLong(1) == 0xFFFFFFFFL && got(1).getLong(2) == 0xFFFFFFFFL,
      "gradient must set all 64 bits")
    assert(got(2).getLong(1) == got(0).getLong(1) &&
      got(2).getLong(2) == got(0).getLong(2), "identical image, identical hash")
    assert(got(3).isNullAt(1) && got(3).isNullAt(2), "null payload")
  }
}
