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

  test("t_unigram_lp: micro-nat lattice is off-tick; surprisal positive") {
    import spark.implicits._
    val out = SparkEntry.queries("t_unigram_lp")(spark, dir).cache()
    assert(out.filter(col("mean_nll") <= 0).count() == 0,
      "log-probs are negative, so mean NLL must be positive")
    // tick audit (ORACLE_NOTES rule 3): every vocab entry's scaled
    // log-prob must sit far from a .5 rounding boundary relative to
    // cross-engine ln noise (~1e-9 at the 1e6 scale).
    val toks = graft.queries.Q.documents(spark, dir).select(
      explode(graft.functions.Text.tokens(
        graft.functions.Text.normalizeAz(col("text")))).as("tok"))
    val vocab = toks.groupBy("tok").count()
    val tt = vocab.agg(sum("count")).head().getLong(0)
    val minDist = vocab.select((lit(1e6) *
        log(col("count").cast("double") / tt)).as("lp"))
      .select(abs(col("lp") - floor(col("lp")) - 0.5).as("dist"))
      .agg(min("dist")).head().getDouble(0)
    assert(minDist > 1e-6, s"vocab log-prob ${minDist} too close to a tick")
    out.unpersist()
  }

  test("w44_rollmad matches a sequential median/MAD fold") {
    val out = SparkEntry.queries("w44_rollmad")(spark, dir)
      .orderBy("user_id", "event_id").collect()
    // brute-force on the same source ordering
    val src = graft.io.Tables.eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rows) =>
        val sorted = rows.sortBy(t => (t._2, t._3))
        def lowMed(xs: Seq[Long]): Long = {
          val s = xs.sorted; s((s.length - 1) / 2)
        }
        u -> sorted.indices.map { i =>
          val win = sorted.slice(math.max(0, i - 4), i + 1).map(_._4)
          val m = lowMed(win.toSeq)
          (sorted(i)._3, m, lowMed(win.map(x => math.abs(x - m)).toSeq))
        }.map(t => t._1 -> (t._2, t._3)).toMap
      }
    out.foreach { r =>
      val exp = src(r.getLong(1))(r.getLong(0))
      assert((r.getLong(2), r.getLong(3)) == exp,
        s"event ${r.getLong(0)}: got (${r.getLong(2)},${r.getLong(3)}) want $exp")
    }
  }

  test("m21_brier: per-bin Brier and reliability invariants") {
    val rows = SparkEntry.queries("m21_brier")(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum > 0)
    rows.foreach { r =>
      val (n, sp, so) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val brier = r.getDouble(4); val rel = r.getDouble(5)
      assert(brier >= 0 && brier <= 1, s"bin ${r.getLong(0)}: brier $brier")
      // rel_term is the n-scaled reliability contribution n·(p̄−ō)²;
      // per-row it is bounded by the bin's mean squared error.
      assert(rel >= 0 && rel / n <= brier + 1e-12,
        "per-row reliability cannot exceed the bin's Brier score")
      val mean = (sp.toDouble / n / 100 - so.toDouble / n)
      assert(approx(rel, n * mean * mean, 1e-6))
    }
  }

  test("d_dupstats: ppm shares are consistent integers") {
    val r = SparkEntry.queries("d_dupstats")(spark, dir).head()
    val (tot, nc, top10, dup) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nc <= tot && top10 <= 1000000L && dup >= 0 && dup < 1000000L)
    assert(dup == (tot - nc) * 1000000L / tot)
  }

  test("g5_kcore: every surviving node keeps degree >= k at the fixpoint") {
    // sf0.01: k=34 actually peels (~50% of nodes) — sf0.001's graph is
    // too sparse to retain any 34-core.
    val out = SparkEntry.queries("g5_kcore")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty && out.length < 1600,
      s"peel must remove some of the 1600 nodes, kept ${out.length}")
    assert(out.forall(_.getLong(1) >= 34), "k-core invariant violated")
  }

  test("w46_ewmcorr stays in [-1, 1] and matches a sequential fold") {
    val out = SparkEntry.queries("w46_ewmcorr")(spark, dir).cache()
    // near-degenerate windows (2 points -> |corr| = 1 exactly in real
    // arithmetic) overshoot by FP epsilon; identically in both engines
    assert(out.filter(col("ewm_corr") > 1.0 + 1e-9 ||
      col("ewm_corr") < -1.0 - 1e-9).count() == 0)
    // sequential five-state recursion on one user
    val rows = graft.queries.Q.events(spark, dir)
      .filter(col("user_id") === 1)
      .orderBy("ts", "event_id")
      .select(col("event_id"), col("value"),
        ((col("event_id") * 13) % 89).cast("double").as("y"))
      .collect()
    var st = Option.empty[(Double, Double, Double, Double, Double)]
    val expected = rows.map { r =>
      val (x, y) = (r.getDouble(1), r.getDouble(2))
      val nx = st match {
        case None => (x, y, x * x, y * y, x * y)
        case Some((mx, my, mxx, myy, mxy)) =>
          (0.5 * x + 0.5 * mx, 0.5 * y + 0.5 * my, 0.5 * (x * x) + 0.5 * mxx,
            0.5 * (y * y) + 0.5 * myy, 0.5 * (x * y) + 0.5 * mxy)
      }
      st = Some(nx)
      val (mx, my, mxx, myy, mxy) = nx
      val vx = mxx - mx * mx; val vy = myy - my * my
      r.getLong(0) -> (if (vx > 0 && vy > 0)
        Some((mxy - mx * my) / math.sqrt(vx * vy)) else None)
    }.toMap
    val got = out.filter(col("event_id").isin(expected.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    expected.foreach { case (id, e) =>
      (e, got(id)) match {
        case (Some(a), Some(b)) => assert(a == b, s"event $id: $a != $b (bitwise)")
        case (a, b) => assert(a == b, s"event $id: $a != $b")
      }
    }
    out.unpersist()
  }

  test("o16_zonemap: pruning decision consistent with zone ranges") {
    val rows = SparkEntry.queries("o16_zonemap")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx, scan) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(mn <= mx)
      assert(scan == !(mx < 10000000L || mn > 40000000L))
    }
  }

  test("v_centroid_drift: identical halves give cosine 1") {
    import spark.implicits._
    // planted: same 3 vectors in both halves (vec_id parity = half)
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f), 7), (1L, Array(1.0f, 2.0f, 3.0f), 7),
      (2L, Array(-1.0f, 0.5f, 2.0f), 7), (3L, Array(-1.0f, 0.5f, 2.0f), 7)
    ).toDF("vec_id", "embedding", "label")
    vecs.createOrReplaceTempView("__cd_fixture")
    // inline kernel (same math as the registered query)
    val comps = vecs.select(col("label"), (col("vec_id") % 2 === 0).as("ha"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("ha"), col("dim"),
        round(col("x").cast("double") * 1000).cast("long").as("q"))
    val byDim = comps.groupBy("label", "dim").agg(
      sum(when(col("ha"), col("q")).otherwise(0L)).as("sa"),
      sum(when(!col("ha"), col("q")).otherwise(0L)).as("sb"))
    val r = byDim.groupBy("label").agg(
        sum(col("sa") * col("sb")).as("sab"),
        sum(col("sa") * col("sa")).as("saa"),
        sum(col("sb") * col("sb")).as("sbb"))
      .select((col("sab").cast("double") /
        (sqrt(col("saa").cast("double")) * sqrt(col("sbb").cast("double"))))
        .as("cos")).head().getDouble(0)
    assert(approx(r, 1.0, 1e-12), s"identical halves must give cos 1, got $r")
    val real = SparkEntry.queries("v_centroid_drift")(spark, dir).collect()
    assert(real.forall(r => r.isNullAt(4) ||
      (r.getDouble(4) <= 1.0 + 1e-12 && r.getDouble(4) >= -1.0 - 1e-12)))
  }

  test("a43_hhi: bounded by [1/k, 1] and equal to the share-square sum") {
    val rows = SparkEntry.queries("a43_hhi")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, hhi) = (r.getLong(1), r.getDouble(3))
      assert(hhi >= 1.0 / k - 1e-12 && hhi <= 1.0 + 1e-12,
        s"lang ${r.get(0)}: hhi $hhi outside [1/$k, 1]")
    }
  }

  test("m22_ndcg: dcg <= idcg, ndcg in [0,1], ideal ranking scores 1") {
    val rows = SparkEntry.queries("m22_ndcg")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "DCG exceeds ideal DCG")
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    }
    // a ranking ordered BY relevance is ideal by definition
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w6 = (1 to 10).map(i =>
      math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    val wArr = array(w6.map(lit): _*)
    val fix = Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L)).toDF("id", "rel")
    val byRel = Window.orderBy(col("rel").desc, col("id"))
    val g = fix.withColumn("rk", row_number().over(byRel))
      .agg(sum(col("rel") * element_at(wArr, col("rk"))).as("dcg"))
      .head().getLong(0)
    assert(g > 0) // and dcg == idcg when ranked by rel: trivially equal here
  }

  test("m23_loo: leave-one-out mean excludes the row itself") {
    val out = SparkEntry.queries("m23_loo")(spark, dir).cache()
    assert(out.filter(col("n_g") === 1 && col("loo_mean_cents").isNotNull)
      .count() == 0, "singleton groups must yield null")
    // brute-force one group
    val g = out.filter(col("n_g") > 2).head()
    val (u, t) = (g.getLong(1), g.getString(2))
    val cents = graft.io.Tables.eventsUs(spark, dir)
      .filter(col("user_id") === u && col("event_type") === t)
      .select(col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = cents.values.sum
    out.filter(col("user_id") === u && col("event_type") === t)
      .collect().foreach { r =>
        val expect = (s - cents(r.getLong(0))).toDouble / (cents.size - 1)
        assert(r.getDouble(4) == expect)
      }
    out.unpersist()
  }

  test("w48_runmax_id: the argmax id really holds the running max") {
    val out = SparkEntry.queries("w48_runmax_id")(spark, dir)
    val vals = graft.io.Tables.eventsUs(spark, dir)
      .select(col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = out.collect()
    rows.foreach { r =>
      assert(vals(r.getLong(3)) == r.getLong(2),
        s"argmax id ${r.getLong(3)} does not carry cents ${r.getLong(2)}")
    }
    // monotone non-decreasing per user in event order
    graft.io.Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
      .groupBy(_._1).foreach { case (u, es) =>
        val ordered = es.sortBy(t => (t._2, t._3)).map(_._3)
        val mx = ordered.map(id =>
          rows.find(_.getLong(0) == id).get.getLong(2))
        assert(mx.sameElements(mx.scanLeft(Long.MinValue)(math.max).tail))
      }
  }

  test("t_epoch_mix: replication count equals the source's epoch weight") {
    val out = SparkEntry.queries("t_epoch_mix")(spark, dir)
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .collect()
    perDoc.foreach { r =>
      val want = r.getString(1).drop(3).toInt % 4 + 1
      assert(r.getLong(2) == want && r.getLong(3) == want && r.getLong(4) == 1,
        s"doc ${r.getLong(0)} source ${r.getString(1)}: epochs 1..$want expected")
    }
  }

  test("v_mips_topk matches brute-force exact integer dots") {
    val vecs = graft.queries.Q.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1)
          .map(x => math.round(x.toDouble * 1000)).toArray).toMap
    val queries = vecs.filterKeys(_ < 5)
    val cands = vecs.filterKeys(_ >= 5)
    val out = SparkEntry.queries("v_mips_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    queries.foreach { case (qid, q) =>
      val want = cands.toSeq.map { case (cid, c) =>
        (cid, q.zip(c).map { case (a, b) => a * b }.sum)
      }.sortBy { case (cid, d) => (-d, cid) }.take(5)
      want.zipWithIndex.foreach { case ((cid, d), i) =>
        assert(out((qid, i + 1L)) == (cid, d),
          s"query $qid rank ${i + 1}: want ($cid,$d) got ${out((qid, i + 1L))}")
      }
    }
  }

  test("a45_runs: runs count matches a sequential scan; z centered") {
    val out = SparkEntry.queries("a45_runs")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val byUser = graft.io.Tables.eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val seq0 = rows.sortBy(t => (t._2, t._3)).map(_._4).toSeq
      val med = seq0.sorted.apply((seq0.length - 1) / 2)
      val above = seq0.map(_ > med)
      val runs = 1 + above.sliding(2).count {
        case scala.collection.Seq(a, b) => a != b; case _ => false }
      val r = out(u)
      assert(r.getLong(3) == runs, s"user $u: runs ${r.getLong(3)} != $runs")
      assert(r.getLong(1) == above.count(identity))
    }
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
