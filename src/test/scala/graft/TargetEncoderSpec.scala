package graft

import org.apache.spark.sql.functions._
import graft.ml.TargetEncoder

/** The leak-freedom contract of OOF target encoding: a row's own fold
  * must never contribute to its encoding.
  */
class TargetEncoderSpec extends SparkSpec {
  import spark.implicits._

  test("encoding excludes the row's own fold (hand-computable case)") {
    // category A: fold 0 targets {10, 20}, fold 1 targets {100}
    val df = Seq(
      ("A", 0L, 10L), ("A", 0L, 20L), ("A", 1L, 100L),
      ("B", 0L, 7L) // category that exists only in one fold
    ).toDF("cat", "fold", "y")
    val got = TargetEncoder.oofEncode(df, "cat", "fold", col("y"))
      .select("cat", "fold", "y", "enc")
      .as[(String, Long, Long, Option[Double])].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.head._4).toMap
    // fold-0 A rows see only fold 1: 100/1
    assert(got(("A", 0L)).contains(100.0))
    // fold-1 A row sees only fold 0: (10+20)/2
    assert(got(("A", 1L)).contains(15.0))
    // B exists only in its own fold → null (no leakage fallback)
    assert(got(("B", 0L)).isEmpty)
  }

  test("global-mean sanity: encodings average back to the right range") {
    // fold-dependent offset makes per-fold means genuinely differ, so
    // excluding the own fold must move the encoding
    val rows = (1 to 300).map(i => ("c" + (i % 5), (i % 3).toLong,
      ((i * 13) % 44).toLong + (i % 3) * 2))
    val df = rows.toDF("cat", "fold", "y")
    val enc = TargetEncoder.oofEncode(df, "cat", "fold", col("y"))
      .select("cat", "fold", "enc").as[(String, Long, Double)].collect()
    assert(enc.nonEmpty)
    // every encoding is a mean of y values, so it must lie in [0, 49]
    enc.foreach { case (_, _, e) => assert(e >= 0.0 && e <= 49.0) }
    // and differ from the naive WITH-own-fold mean for at least one cell
    val withOwn = rows.groupBy(_._1).view
      .mapValues(rs => rs.map(_._3).sum.toDouble / rs.size)
    assert(enc.exists { case (c, _, e) => math.abs(e - withOwn(c)) > 1e-12 })
  }
}
