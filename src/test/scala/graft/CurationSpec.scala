package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the round-5 curation operators (CurationQ).
  * The driver's DuckDB gate covers value parity; these pin the
  * *meaning*: ring-neighbor structure, containment extremes, entropy
  * and JSD bounds.
  */
class CurationSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("t_negsample: 3 distinct negatives per doc, never self, deterministic") {
    val out = SparkEntry.queries("t_negsample")(spark, dir).cache()
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct("neg_id").as("nd"))
      .collect()
    assert(perDoc.forall(r => r.getLong(1) == 3 && r.getLong(2) == 3),
      "every doc must get exactly 3 distinct negatives")
    assert(out.filter(col("neg_id") === col("doc_id")).count() == 0)
    val again = SparkEntry.queries("t_negsample")(spark, dir)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0,
      "hash-ring sampling must be rerun-deterministic")
    out.unpersist()
  }

  test("d_contain: a doc fully inside its neighbor has containment 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "prefix text the quick brown fox jumps over the lazy dog suffix"),
      (3L, "completely unrelated words about databases and engines")
    ).toDF("doc_id", "text")
    // same kernel as the registered query, inlined on a fixture
    val g = docs.select(col("doc_id"),
      array_distinct(graft.functions.Text.charNgrams(
        graft.functions.Text.normalizeAz(col("text")), 3)).as("g"))
    val a = g.select(col("doc_id").as("doc_a"), col("g").as("ga"))
    val b = g.select((col("doc_id") - 1).as("doc_a"),
      col("doc_id").as("doc_b"), col("g").as("gb"))
    val rows = a.join(b, "doc_a")
      .select(col("doc_a"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(col("ga"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) == 1.0, "doc 1's grams all appear in doc 2")
    assert(rows(2L) < 0.35, s"doc 2 vs unrelated doc 3 got ${rows(2L)}")
  }

  test("m20_infogain: per-value entropy terms reconstruct H(label|f) <= ln 2") {
    val rows = SparkEntry.queries("m20_infogain")(spark, dir).collect()
    assert(rows.nonEmpty)
    val hCond = rows.map { r =>
      val hp = if (r.isNullAt(3)) 0.0 else r.getDouble(3)
      val hn = if (r.isNullAt(4)) 0.0 else r.getDouble(4)
      hp + hn
    }.sum
    assert(hCond >= 0.0 && hCond <= math.log(2.0) + 1e-9,
      s"conditional entropy $hCond outside [0, ln 2]")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)), "n_pos <= n_f")
  }

  test("a41_jsd: per-source term sums land in [0, ln 2]") {
    val out = SparkEntry.queries("a41_jsd")(spark, dir)
    val bySource = out.groupBy("source").agg(
      sum(coalesce(col("jsd_term_p"), lit(0.0))).as("sp"),
      sum(col("jsd_term_q")).as("sq")).collect()
    bySource.foreach { r =>
      val jsd = r.getDouble(1) + r.getDouble(2)
      // rounding of each term at 6 dp can push the sum a hair negative
      assert(jsd >= -1e-4 && jsd <= math.log(2.0) + 1e-4,
        s"source ${r.get(0)}: jsd $jsd outside [0, ln 2]")
    }
  }
}
