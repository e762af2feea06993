package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic split / stratified sample / context-window packing. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: boundaries exact, assignment deterministic") {
    val df = (0L until 1000L).toDF("k")
    val (bucket, split) = Sampling.hashSplit(col("k"))
    val r = df.select(col("k"), bucket.as("b"), split.as("s"))
    val counts = r.groupBy("s").count().as[(String, Long)].collect().toMap
    // keys 0..999 cycle buckets 0..99 uniformly: 80/10/10 exactly.
    assert(counts("train") == 800 && counts("val") == 100 && counts("test") == 100)
    // stable across evaluations
    assert(r.collect().toSeq == r.collect().toSeq)
  }

  test("temperatureMixture: sqrt-flattened rates, small groups capped at 1") {
    // 900 'big' rows vs 100 'small': shares flatten to 3:1, budget 0.5
    // of 1000 = 500 → big rate = 500*0.75/900 ≈ 0.4167, small =
    // 500*0.25/100 = 1.25 → capped to 1 (small keeps everything).
    // keys stride by 1543 so they SPAN the ppm space — consecutive
    // 0..899 would all sit below the threshold and never exercise the
    // keep boundary
    val df = ((0L until 900L).map(i => ("big", i * 1543L)) ++
      (900L until 1000L).map(i => ("small", i * 1543L))).toDF("grp", "k")
    val r = Sampling.temperatureMixture(df, "grp", col("k"), budgetFrac = 0.5)
    val rates = r.select("grp", "rate_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("small") == 1000000L)
    assert(math.abs(rates("big") - 416666L) <= 1)
    // every small-group row kept; big-group keep decision is the
    // integer hash threshold, and both sides of the boundary occur
    assert(r.filter(col("grp") === "small" && !col("kept")).isEmpty)
    val keptBig = r.filter(col("grp") === "big" && col("kept")).count()
    val expected = (0L until 900L).count(i => (i * 1543L) % 1000000L < rates("big"))
    assert(keptBig == expected && keptBig > 0 && keptBig < 900)
  }

  test("temperatureMixture: null group is a real group, not dropped") {
    val df = Seq((Some("a"), 1L), (Some("a"), 2L), (None, 3L), (None, 4L))
      .toDF("grp", "k")
    val r = Sampling.temperatureMixture(df, "grp", col("k"), budgetFrac = 1.0)
    assert(r.count() == 4, "null-group rows must survive the rates join")
    // equal shares, budget 1.0 -> everything kept at rate 1.0
    assert(r.filter(!col("kept")).isEmpty)
  }

  test("stratifiedSample keeps exactly ceil(n*num/den) rows per stratum") {
    val df = (1 to 103).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val kept = Sampling.stratifiedSample(df, Seq(col("g")), Seq(col("id")), 1, 5)
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    val n = df.groupBy("g").count().as[(String, Long)].collect().toMap
    for ((g, total) <- n)
      assert(byG(g) == (total + 4) / 5, s"stratum $g: ${byG(g)} of $total")
    // keeps the LOWEST-ranked rows: max kept id per stratum < min dropped.
    val keptIds = kept.select("g", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max)
    val dropped = df.except(kept).select("g", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
    for ((g, mx) <- keptIds) assert(mx < dropped(g))
  }

  test("bandJoin == theta-join result, negative values included") {
    val l = Seq(("a", 1L, -5.0), ("a", 2L, 0.0), ("a", 3L, 9.9),
      ("b", 4L, 100.0)).toDF("k", "lid", "lv")
    val r = Seq(("a", 11L, -9.0), ("a", 12L, 4.9), ("a", 13L, 5.1),
      ("b", 14L, 104.9), ("b", 15L, 106.0)).toDF("k", "rid", "rv")
    val band = graft.operators.Spatial.bandJoin(l, r, Seq("k"), "lv", "rv", 5.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val theta = l.join(r, Seq("k")).filter(abs(col("lv") - col("rv")) <= 5.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(band == theta && theta.nonEmpty)
    assert(band.contains((1L, 11L)) && band.contains((4L, 14L)))
    assert(!band.contains((4L, 15L))) // 6.0 > radius
  }

  test("chunkAssemble: chunks partition the token stream at exactly C") {
    val docs = Seq(
      ("s1", 1L, (1 to 100).map(i => s"a$i")),
      ("s1", 2L, (1 to 500).map(i => s"b$i")),
      ("s1", 3L, Seq.empty[String]),
      ("s1", 4L, (1 to 37).map(i => s"c$i")),
      ("s2", 5L, (1 to 10).map(i => s"d$i"))).toDF("shard", "id", "toks")
    val chunks = graft.operators.Sampling.chunkAssemble(docs,
      Seq(col("shard")), Seq(col("id")), col("toks"), 256)
      .orderBy("shard", "chunk_id")
      .select("shard", "chunk_id", "n_tokens", "chunk_tokens")
      .as[(String, Long, Long, Seq[String])].collect()
    // s1: 637 tokens -> chunks of 256, 256, 125; s2: one chunk of 10
    assert(chunks.map(c => (c._1, c._2, c._3)).toList ==
      List(("s1", 0L, 256L), ("s1", 1L, 256L), ("s1", 2L, 125L),
        ("s2", 0L, 10L)))
    // stream order preserved across doc boundaries and chunk cuts
    val s1Stream = chunks.filter(_._1 == "s1").flatMap(_._4).toSeq
    val expected = (1 to 100).map(i => s"a$i") ++
      (1 to 500).map(i => s"b$i") ++ (1 to 37).map(i => s"c$i")
    assert(s1Stream == expected)
    chunks.foreach(c => assert(c._4.length == c._3))
  }

  test("chunkPack: contiguous exact-integer layout per shard") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 0L), ("a", 4L, 300L),
      ("b", 1L, 1000L)).toDF("shard", "id", "toks")
    val packed = Sampling.chunkPack(df, Seq(col("shard")), Seq(col("id")),
      col("toks"), 256).orderBy("shard", "id")
      .select("shard", "id", "cum_before", "chunk_first", "chunk_last",
        "offset_in_chunk")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // shard a: cum 0,100,300,300 -> chunks (0,0),(0,1),(1,1),(1,2), off 0,100,44,44
    assert(packed(0) == ("a", 1L, 0L, 0L, 0L, 0L))
    assert(packed(1) == ("a", 2L, 100L, 0L, 1L, 100L))
    assert(packed(2) == ("a", 3L, 300L, 1L, 1L, 44L)) // empty doc: first==last
    assert(packed(3) == ("a", 4L, 300L, 1L, 2L, 44L))
    // shard b independent: starts at 0, spans chunks 0..3
    assert(packed(4) == ("b", 1L, 0L, 0L, 3L, 0L))
  }

  test("shardShuffle: exact permutation, input-order-free, one exchange") {
    // keys stride by a large odd constant so consecutive ids scatter
    // across shards (a real fingerprint's behavior)
    val df = (0L until 500L).map(i => (i, (i * 2654435761L) % 1000003L))
      .toDF("id", "fp")
    val r = Sampling.shardShuffle(df, col("fp"), col("id"), nShards = 16)
      .select("id", "shard", "pos")
    val rows = r.as[(Long, Long, Long)].collect()
    assert(rows.length == 500)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 16 })
    // (shard, pos) is a bijection: per shard, positions are 0..n-1
    rows.groupBy(_._2).foreach { case (s, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq, s"shard $s")
    }
    // permutation is a pure function of content: reversing input order
    // changes nothing
    val rev = Sampling.shardShuffle(df.orderBy(col("id").desc), col("fp"),
        col("id"), nShards = 16)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(rev.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    // scale shape: one hash exchange (the shard window), no range/sort
    // exchange with sampled boundaries
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = Sampling.shardShuffle(df, col("fp"), col("id"), 16)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(shuffles.size == 1, s"want 1 exchange, got ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
