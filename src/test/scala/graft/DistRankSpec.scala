package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DistRank

/** DistRank must be bitwise-equal to the single-partition window
  * plans it replaces: every test pits the distributed two-pass
  * against Spark's own `Window.orderBy(...)` on the same frame. */
class DistRankSpec extends SparkSpec {
  import spark.implicits._

  // 999 rows, deliberately skewed + tie-heavy key (k = id % 7 has
  // ~143 rows per distinct value, so bucket boundaries MUST respect
  // tie groups), unique tiebreaker id.
  private lazy val base = spark.range(0, 999)
    .select(col("id"), (col("id") % 7).as("k"),
      ((col("id") * 37) % 101).as("v"))

  test("global row_number matches single-partition window") {
    val expect = base.withColumn("r",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val got = DistRank.rowNumber(base, col("k"), Seq(col("k"), col("id")),
      "r", parts = 4)
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == expect)
  }

  test("descending order via negated bucket key") {
    val ord = Seq(col("v").desc, col("id"))
    val expect = base.withColumn("r",
      row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val got = DistRank.rowNumber(base, -col("v"), ord, "r", parts = 4)
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == expect)
  }

  test("inclusive and exclusive cumsum + literal grand totals") {
    val wIn = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wEx = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = base
      .withColumn("ci", sum("v").over(wIn))
      .withColumn("ce", coalesce(sum("v").over(wEx), lit(0L)))
      .select("id", "ci", "ce").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val gotIn = DistRank.cumsum(base, col("k"), Seq(col("k"), col("id")),
      Seq((col("v"), "ci")), inclusive = true,
      totalsSuffix = Some("_tot"), parts = 4)
    val gotEx = DistRank.cumsum(base, col("k"), Seq(col("k"), col("id")),
      Seq((col("v"), "ce")), inclusive = false, parts = 4)
    val gi = gotIn.select("id", "ci", "ci_tot").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ge = gotEx.select("id", "ce").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val vTot = base.agg(sum("v")).head().getLong(0)
    base.select("id").collect().map(_.getLong(0)).foreach { id =>
      assert(gi(id)._1 == expect(id)._1, s"inclusive at $id")
      assert(gi(id)._2 == vTot, s"total at $id")
      assert(ge(id) == expect(id)._2, s"exclusive at $id")
    }
  }

  test("ntileOf matches Spark ntile for every bucket count 1..9") {
    // also at N not divisible by n, and on a 3-row frame (N < n)
    (1 to 9).foreach { n =>
      val ord = Seq(col("v"), col("id"))
      val expect = base.withColumn("t",
        ntile(n).over(Window.orderBy(ord: _*)).cast("long"))
        .select("id", "t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val ranked = DistRank.rowNumber(base, col("v"), ord, "r",
        totalAs = Some("nn"), parts = 4)
      val got = ranked
        .select(col("id"), DistRank.ntileOf(col("r"), col("nn"), n).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expect, s"ntile($n)")
    }
    val tiny = spark.range(0, 3).select(col("id"), col("id").as("v"))
    val expect = tiny.withColumn("t",
      ntile(5).over(Window.orderBy("v", "id")).cast("long"))
      .select("id", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = DistRank.rowNumber(tiny, col("v"), Seq(col("v"), col("id")),
      "r", totalAs = Some("nn"), parts = 4)
      .select(col("id"), DistRank.ntileOf(col("r"), col("nn"), 5).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect, "ntile(5) with N < n")
  }

  test("empty input yields empty output") {
    val empty = base.filter(col("id") < 0)
    assert(DistRank.rowNumber(empty, col("k"), Seq(col("k"), col("id")),
      "r", parts = 4).count() == 0L)
  }

  test("NaN bucket keys rank at the global tail") {
    // NaN sorts ABOVE every finite double in Spark's ordering; the
    // bucket assignment must agree or cross-bucket offsets corrupt.
    val df = base.withColumn("kd",
      when(col("id") % 13 === 0, lit(Double.NaN))
        .otherwise(col("v").cast("double")))
    val ord = Seq(col("kd"), col("id"))
    val expect = df.withColumn("r",
      row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val got = DistRank.rowNumber(df, col("kd"), ord, "r", parts = 4)
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == expect)
  }

  test("rowNumbers fuses several orders, identical to rowNumber") {
    val specs = Seq(
      DistRank.RankSpec(col("k"), Seq(col("k"), col("id")), "rk"),
      DistRank.RankSpec(-col("v"), Seq(col("v").desc, col("id")), "rv"),
      DistRank.RankSpec(col("id"), Seq(col("id")), "ri"))
    val fused = DistRank.rowNumbers(base, specs, totalAs = Some("n"),
      parts = 4)
      .select("id", "rk", "rv", "ri", "n").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    def one(b: org.apache.spark.sql.Column,
        ord: Seq[org.apache.spark.sql.Column]) =
      DistRank.rowNumber(base, b, ord, "r", parts = 4)
        .select("id", "r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val (ek, ev, ei) = (one(col("k"), specs(0).order),
      one(-col("v"), specs(1).order), one(col("id"), specs(2).order))
    base.select("id").collect().map(_.getLong(0)).foreach { id =>
      assert(fused(id)._1 == ek(id) && fused(id)._2 == ev(id) &&
        fused(id)._3 == ei(id), s"fused ranks at $id")
      assert(fused(id)._4 == 999L, s"total at $id")
    }
  }

  test("parts=1 fast path: aggregate-grain only, same results") {
    val agg = base.groupBy("k").agg(sum("v").as("sv"))
    val ord = Seq(col("sv"), col("k"))
    val expect = agg.withColumn("r",
      row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select("k", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val got = DistRank.rowNumber(agg, col("sv"), ord, "r", parts = 1)
      .select("k", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == expect)
    // row-scale input (a raw scan core) must be rejected
    intercept[IllegalArgumentException] {
      DistRank.rowNumber(base, col("k"), Seq(col("k"), col("id")),
        "r", parts = 1)
    }
    // an exploded aggregate is row-scale again — also rejected
    val exploded = agg.select(col("k"),
      explode(array(col("sv"), col("sv"))).as("x"))
    intercept[IllegalArgumentException] {
      DistRank.rowNumber(exploded, col("x"), Seq(col("x"), col("k")),
        "r", parts = 1)
    }
  }

  test("cummin matches single-partition running min, incl and excl") {
    val wIn = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wEx = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = base
      .withColumn("mi", min("v").over(wIn))
      .withColumn("me", coalesce(min("v").over(wEx), lit(Long.MaxValue)))
      .select("id", "mi", "me").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val gi = DistRank.cummin(base, col("k"), Seq(col("k"), col("id")),
      Seq((col("v"), "mi")), inclusive = true, parts = 4)
      .select("id", "mi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ge = DistRank.cummin(base, col("k"), Seq(col("k"), col("id")),
      Seq((col("v"), "me")), inclusive = false, parts = 4)
      .select("id", "me").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    base.select("id").collect().map(_.getLong(0)).foreach { id =>
      assert(gi(id) == expect(id)._1, s"inclusive at $id")
      assert(ge(id) == expect(id)._2, s"exclusive at $id")
    }
  }

  test("plan has no single-partition window") {
    val plan = DistRank.rowNumber(base, col("k"),
      Seq(col("k"), col("id")), "r", parts = 4)
      .queryExecution.executedPlan.toString
    assert(!(plan.contains("Window") && plan.contains("SinglePartition")),
      "distributed rank must not plan a global window")
  }

  test("adjacentPairs equals the global-order lead, N-1 rows") {
    // (k, id) total order; payload v AND the order column k itself
    val expect = base
      .withColumn("vn", lead(col("v"), 1)
        .over(Window.orderBy(col("k"), col("id"))))
      .withColumn("kn", lead(col("k"), 1)
        .over(Window.orderBy(col("k"), col("id"))))
      .filter(col("vn").isNotNull)
      .select("v", "k", "vn", "kn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val got = DistRank.adjacentPairs(base, col("k"),
        Seq(col("k"), col("id")), Seq("v", "k"), parts = 4)
      .select("v", "k", "v_n", "k_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got.size == 998 && got == expect)
  }

  test("adjacentPairs: sparse buckets, single row, empty input") {
    // two far-apart key islands with p=8 leaves most buckets empty —
    // the boundary join must still chain across PRESENT buckets only
    val sparse = spark.range(0, 20)
      .select(col("id"), when(col("id") < 10, col("id"))
        .otherwise(col("id") * 1000).as("k"))
    val expect = sparse
      .withColumn("kn", lead(col("k"), 1).over(Window.orderBy(col("k"))))
      .filter(col("kn").isNotNull)
      .select("k", "kn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = DistRank.adjacentPairs(sparse, col("k"), Seq(col("k")),
        Seq("k"), parts = 8)
      .select("k", "k_n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got.size == 19 && got == expect)
    assert(DistRank.adjacentPairs(base.limit(1), col("k"),
      Seq(col("k"), col("id")), Seq("v"), parts = 4).count() == 0L)
    assert(DistRank.adjacentPairs(base.limit(0), col("k"),
      Seq(col("k"), col("id")), Seq("v"), parts = 4).count() == 0L)
  }
}
