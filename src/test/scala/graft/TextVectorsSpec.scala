package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Text primitives (hashing, n-grams, ratios) and dense-vector math. */
class TextVectorsSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches the reference fold formula") {
    def hand(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Text.P)
    val r = spark.range(1).select(
      Text.polyHash(lit("abc")).as("a"),
      Text.polyHash(lit("")).as("e"),
      Text.polyHash(lit("spark table row")).as("s")).head()
    assert(r.getLong(0) == hand("abc"))
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == hand("spark table row"))
  }

  test("charNgrams: correct count, empty below width") {
    val r = spark.range(1).select(
      Text.charNgrams(lit("abcde"), 3).as("g"),
      Text.charNgrams(lit("ab"), 3).as("short")).head()
    assert(r.getSeq[String](0) == Seq("abc", "bcd", "cde"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("NgramPosHash: positional hashes == per-gram polyHashElem, both exec paths") {
    import graft.functions.NgramPosHash
    // projection (whole-stage codegen / doGenCode) over 64 rows
    val df = (0 until 64).map(i => s"abcde$i-winnow sample").toDF("t")
    val viaExpr = df.select(
      posexplode(NgramPosHash.ngramPosHashes(col("t"), 5))
        .as(Seq("pos", "h")))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val viaStrings = df.select(
      posexplode(Text.charNgrams(col("t"), 5)).as(Seq("pos", "g")))
      .select(col("pos"), Text.polyHashElem(col("g")).as("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(viaExpr.sorted.toSeq == viaStrings.sorted.toSeq)
    // interpreted eval (filter) agrees with codegen; short/empty input
    val r = spark.range(1).select(
      NgramPosHash.ngramPosHashes(lit("abcd"), 5).as("short"),
      NgramPosHash.ngramPosHashes(lit("abcde"), 5).as("one")).head()
    assert(r.getSeq[Long](0).isEmpty)
    def hand(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Text.P)
    assert(r.getSeq[Long](1) == Seq(hand("abcde")))
  }

  test("normalize + tokens: lowercase a-z only, empties dropped") {
    val r = spark.range(1).select(
      Text.tokens(Text.normalizeAz(lit("Hello,  World! 123"))).as("t")).head()
    assert(r.getSeq[String](0) == Seq("hello", "world"))
  }

  test("wordSetRatio and countTokensIn") {
    val toks = Text.tokens(lit("the cat and the dog"))
    val r = spark.range(1).select(
      Text.wordSetRatio(toks, Seq("the", "and")).as("r"),
      Text.countTokensIn(toks, Seq("the")).as("c")).head()
    assert(approx(r.getDouble(0), 3.0 / 5))
    assert(r.getInt(1) == 2)
  }

  test("vector math: dot, norm, cosine, l2 on known vectors") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.norm(col("a")).as("n"),
      Vectors.cosine(col("a"), col("b")).as("c"),
      Vectors.l2Dist(col("a"), col("b")).as("l")).head()
    assert(approx(r.getDouble(0), 24.0))
    assert(approx(r.getDouble(1), 5.0))
    assert(approx(r.getDouble(2), 24.0 / 25.0))
    assert(approx(r.getDouble(3), math.sqrt(2.0)))
  }

  test("codegen DotProduct == higher-order fold, bitwise") {
    val rng = new scala.util.Random(21)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(64)(rng.nextFloat()), Seq.fill(64)(rng.nextFloat()))
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
      Vectors.dot(col("a"), col("b")).as("fast"),
      Vectors.dotHof(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("DotProduct null semantics: length mismatch and null element -> null") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(Vectors.dot(col("a"), col("b")).as("d"))
      .orderBy(col("d").asc_nulls_first).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) == 5.0)
  }

  test("cosine zero-vector guard returns 0, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(Vectors.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("kmeans-learned IVF centroids: full probe == brute force, partial probe useful") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble)
    val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val learned = graft.ml.IvfCentroids.learn(e, "embedding", k = 8,
      seed = 42L, maxIter = 5)
    def got(nprobe: Int): Set[Long] =
      Similarity.ivfTopK(e, "vec_id", "embedding",
        learned, "centroid_id", "centroid", q, k = 10, nprobe = nprobe)
        .collect().map(_.getLong(0)).toSet
    // probing every cluster degrades to exact search — recall 1.0
    assert(got(8) == truth)
    // 2-of-8 probe keeps a useful fraction (blocking recall bound)
    val r2 = (got(2) & truth).size.toDouble / truth.size
    assert(r2 >= 0.5, s"nprobe=2 recall $r2")
  }

  test("ivfAssign: map-typed payload takes the join-back fallback, same assignment") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val plain = Similarity.ivfAssign(e, "vec_id", "embedding",
      cents, "cid", "cemb")
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // a map-typed payload column is unorderable — the struct-max path
    // would fail analysis; the fallback must produce the SAME winners
    val withMap = e.withColumn("meta",
      map(lit("src"), col("vec_id").cast("string")))
    val fb = Similarity.ivfAssign(withMap, "vec_id", "embedding",
      cents, "cid", "cemb")
    assert(fb.columns.contains("meta"))
    val got = fb.select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == plain)
  }

  test("CentroidArgmax: bitwise parity with the crossJoin+struct-max form") {
    import graft.operators.Similarity
    import graft.functions.Vectors
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 9)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    // fused path (ivfAssign routes through CentroidArgmax at this K)
    val fused = Similarity.ivfAssign(e, "vec_id", "embedding",
      cents, "cid", "cemb")
      .select("vec_id", "centroid_id", "centroid_cos").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // reference: the explicit join + struct-max formulation
    val joined = e.withColumn("__na", Vectors.norm(col("embedding")))
      .crossJoin(broadcast(cents.select(col("cid"),
        col("cemb"), Vectors.norm(col("cemb")).as("__cn"))))
      .withColumn("cos", Vectors.cosineWithNorms(col("embedding"),
        col("cemb"), col("__na"), col("__cn")))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("cid")).as("nc"))).as("b"))
      .select(col("vec_id"), (-col("b.nc")).as("cid"), col("b.cos"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(fused.keySet == joined.keySet)
    fused.keys.foreach { id =>
      assert(fused(id)._1 == joined(id)._1, s"winner at $id")
      assert(java.lang.Double.doubleToRawLongBits(fused(id)._2) ==
        java.lang.Double.doubleToRawLongBits(joined(id)._2),
        s"cos bits at $id")
    }
    // interpreted eval agrees with codegen (collect forces codegen;
    // Literal-based eval goes through nullSafeEval)
    val one = e.filter(col("vec_id") === 7).head()
    val emb = one.getSeq[Float](1).toArray
    val cRows = cents.collect().sortBy(_.getLong(0))
    val cids = cRows.map(_.getLong(0))
    val cm = cRows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val expr = graft.functions.CentroidArgmax(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        emb, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      cids, cm, cm.map(graft.functions.CentroidArgmax.foldNorm))
    val r = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(r.getLong(0) == fused(7L)._1)
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
      java.lang.Double.doubleToRawLongBits(fused(7L)._2))
  }

  test("randomProjection: deterministic signs, pinned association") {
    import graft.operators.Similarity
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val r = Similarity.randomProjection(df, "embedding", inDims = 4, outDims = 2)
      .head()
    val expected = (0 until 2).map { j =>
      (0 until 4).map(i => Similarity.projSign(j, i, 4).toDouble * (i + 1))
        .reduceLeft(_ + _) / math.sqrt(2.0)
    }
    assert(r.getDouble(1) == expected(0) && r.getDouble(2) == expected(1))
  }

  test("projSign family is not degenerate: rows differ, columns balanced") {
    import graft.operators.Similarity
    // Regression: an LCG low-bit sign made every projection row the
    // SAME ±pattern (JL dims all identical, sign-LSH sigs 0x00/0xFF).
    val rows = (0 until 16).map(j =>
      (0 until 64).map(i => Similarity.projSign(j, i, 64)).toList)
    assert(rows.distinct.size == 16, "projection rows must be distinct")
    rows.foreach { r =>
      val pos = r.count(_ == 1)
      assert(pos >= 16 && pos <= 48, s"row sign balance off: $pos/64 positive")
    }
  }

  test("scalarQuantize: endpoints hit 0/255, degenerate dim codes 0") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(0.0f, 7.0f)),
      (2L, Seq(10.0f, 7.0f)),
      (3L, Seq(5.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantize(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 0L, 0L), (2L, 0L, 255L), (3L, 0L, 127L),  // dim 0: 0..10
      (1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L)))     // dim 1 degenerate
  }

  test("chunking: stride-S windows cover every token; overlap is W-S") {
    // 80 distinct ALPHABETIC tokens (normalizeAz strips digits!),
    // W=32, S=24 -> starts 1,25,49,73: 4 chunks, last short.
    val text = (0 until 80).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    val W = 32
    val S = 24
    val toks = Text.tokens(Text.normalizeAz(lit(text)))
    val chunks = spark.range(1)
      .select(toks.as("toks"))
      .select(col("toks"),
        explode(Text.chunkStarts(col("toks"), S)).as("start"))
      .select(((col("start") - 1) / S).cast("long").as("chunk_id"),
        slice(col("toks"), col("start"), lit(W)).as("piece"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(chunks.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(chunks.take(3).forall(_._2.size == W))
    assert(chunks.last._2.size == 80 - 72 + 0) // tail chunk: tokens 73..80
    // every token covered, in order, with W-S overlap between neighbors
    assert(chunks.flatMap(_._2).distinct.size == 80)
    assert(chunks(0)._2.takeRight(W - S) == chunks(1)._2.take(W - S))
  }

  test("empty document yields zero chunks (guarded chunkStarts)") {
    val toks = Text.tokens(Text.normalizeAz(lit("")))
    val n = spark.range(1)
      .select(toks.as("toks"))
      .select(explode(Text.chunkStarts(col("toks"), 24)).as("s"))
      .count()
    assert(n == 0L)
  }

  test("ExactLloyd: 3 rounds shrink total within-cluster d2, counts conserved") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val comps = e
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * 1000).cast("long").as("q"))
      .cache()
    def totalD2(cents: org.apache.spark.sql.DataFrame): Long =
      comps.join(broadcast(cents), "dim")
        .groupBy("vec_id", "cid")
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
        .groupBy("vec_id").agg(min("d2").as("best"))
        .agg(sum("best")).head().getLong(0)
    val c0 = comps.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("dim"), col("q").as("cq"))
    val c3 = graft.ml.ExactLloyd.centroids(comps, k = 8, iters = 3)
    // the Lloyd objective is monotone per round; lattice re-rounding
    // perturbs means by <= half a milli-tick, far below the seed gap
    assert(totalD2(c3) <= totalD2(c0),
      "3 Lloyd rounds must not worsen the k-means objective")
    val asn = graft.ml.ExactLloyd.assign(comps, c3, 8)
    assert(asn.count() == e.count(), "every vector assigned exactly once")
    val r = asn.agg(min("cid"), max("cid")).head()
    assert(r.getLong(0) >= 0L && r.getLong(1) < 8L)
  }
}
