package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-6 batch-20 operators. The driver's
  * DuckDB gate covers value parity; these pin meaning: the Hilbert
  * adjacency property (the reason to prefer it over Morton), KM
  * survival-curve invariants, bootstrap weight calibration, and
  * attribution correctness against a driver-side replay.
  */
class Curation20Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("hilbert: bijection and grid-adjacency on the full 32x32 grid") {
    import spark.implicits._
    val n = 32
    val grid = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("px", "py")
    val h = graft.functions.Hilbert
      .withHilbert(grid, col("px"), col("py"), 5, "hval")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(h.map(_._3).distinct.length == n * n, "bijection")
    assert(h.map(_._3).min == 0L && h.map(_._3).max == (n * n - 1).toLong)
    val byD = h.sortBy(_._3)
    // THE Hilbert property: consecutive indices are grid neighbors —
    // every step is Manhattan distance exactly 1 (Morton fails this
    // at every Z-jump).
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // Morton on the same grid has jumps — the distinction is real.
    val morton = grid.select(col("px"), col("py"),
        graft.functions.ZOrder.zOrder2(col("px"), col("py"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val jumps = morton.sliding(2).count {
      case Array((x1, y1, _), (x2, y2, _)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(jumps > 0, "Morton should have Z-jumps on this grid")
  }

  test("a60_kaplan_meier: monotone, bounded, recomputes from factors") {
    val rows = SparkEntry.queries("a60_kaplan_meier")(spark, dir)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    var prev = 1.0
    var prod = 1.0
    rows.foreach { r =>
      val (n, d, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d >= 0 && d <= n, "events bounded by at-risk")
      prod *= 1.0 - d.toDouble / n.toDouble
      assert(s == prod, "surv must equal the exact running product")
      assert(s >= 0.0 && s <= prev + 1e-15, "non-increasing in [0,1]")
      prev = s
    }
    // at-risk counts strictly decrease over days
    val risks = rows.map(_.getLong(1))
    assert(risks.zip(risks.tail).forall { case (a, b) => b < a })
  }

  test("a61_bootstrap: weights calibrated, replicates deterministic") {
    val get = () => SparkEntry.queries("a61_bootstrap")(spark, dir)
      .orderBy("replicate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val a = get()
    assert(a.length == 32)
    assert(a.sameElements(get()), "hash-driven bootstrap is deterministic")
    val nRows = graft.io.Tables.eventsUs(spark, dir).count()
    a.foreach { case (_, nEff, _, mean) =>
      // Poisson(1) weights: E[n_eff] = n, sd = sqrt(n) -> 5 sigma band
      assert(math.abs(nEff - nRows) < 5 * math.sqrt(nRows.toDouble),
        s"n_eff $nEff vs n $nRows outside calibration band")
      assert(mean > 0.0 && mean < 56021.0)
    }
    // replicate means must actually vary (it is a resample, not a copy)
    assert(a.map(_._4).distinct.length > 16)
  }

  test("o22: Hilbert layout boxes beat a hashed layout by an order of magnitude") {
    import spark.implicits._
    // Same cells, two layouts: contiguous Hilbert-range buckets vs
    // hash buckets. The hashed layout's every bucket spans the whole
    // grid (area ~ 1024^2 per bucket); Hilbert buckets are compact
    // tiles — the measurable reason to sort by the curve before
    // writing files.
    val base = graft.queries.Q.lineitem(spark, "/root/testdata/sf0.001")
      .select(pmod(col("l_partkey"), lit(1024L)).as("px"),
        pmod(col("l_suppkey"), lit(1024L)).as("py"))
    val h = graft.functions.Hilbert
      .withHilbert(base, col("px"), col("py"), 10, "hval")
    def totalArea(bucket: org.apache.spark.sql.Column): Long =
      h.groupBy(bucket.as("b"))
        .agg(((max("px") - min("px") + 1) *
          (max("py") - min("py") + 1)).as("a"))
        .agg(sum("a")).collect()(0).getLong(0)
    val hilbertArea = totalArea(expr("hval DIV 16384"))
    val hashedArea = totalArea(pmod(xxhash64(col("px"), col("py")), lit(64L)))
    assert(hilbertArea * 10 < hashedArea,
      s"hilbert $hilbertArea vs hashed $hashedArea")
  }

  test("m32_lloyd_step: every vector sits in its true nearest cluster") {
    import spark.implicits._
    // Recompute assignments driver-side on a 200-vector sample and
    // check the packed-argmin picked the minimum distance (ties to
    // the lower centroid id).
    val vecs = graft.queries.Q.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.round(x.toDouble * 1000)).toArray).toMap
    val cents = (0L to 7L).map(c => c -> vecs(c)).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // m32's digest doesn't expose per-vector rows; recompute the agg
    val expected = vecs.filter(_._1 >= 8).groupBy { case (_, v) =>
      cents.minBy { case (cid, cv) => (d2(v, cv), cid) }._1
    }.map { case (cid, m) => cid -> m.size.toLong }
    val got = SparkEntry.queries("m32_lloyd_step")(spark, dir)
      .select("cluster", "n_assigned").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"assignment counts: got $got want $expected")
  }

  test("a62: bottom-k sketch merge equals bottom-k of the full stream") {
    import spark.implicits._
    // THE mergeability property: bottom-64 of the unioned per-flag
    // bottom-64s == bottom-64 of the whole table.
    val base = graft.queries.Q.lineitem(spark, dir).select(
      col("l_returnflag").as("scope"), col("l_orderkey"), col("l_linenumber"),
      ((col("l_orderkey") * 131071L + col("l_linenumber") * 8191L)
        % 1000003L).as("h"))
    val direct = base.orderBy("h", "l_orderkey", "l_linenumber").limit(64)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("scope").orderBy("h", "l_orderkey", "l_linenumber")
    val merged = base.withColumn("rs", row_number().over(w))
      .filter(col("rs") <= 64)
      .orderBy("h", "l_orderkey", "l_linenumber").limit(64)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(merged == direct, "bottom-k must be mergeable")
  }

  test("j22_allen: block-diagonal census — blocks partition, census subsets") {
    import spark.implicits._
    // With a tiny block target the day splits into many blocks; the
    // blocked census must classify a SUBSET of the exhaustive pairs
    // per (day, relation), with n_blocks reported in-band.
    val full = graft.queries.Curation24Q.allenCensus(spark, dir, 1000000L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val blocked = graft.queries.Curation24Q.allenCensus(spark, dir, 3L)
      .collect()
    assert(blocked.nonEmpty)
    blocked.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      assert(r.getLong(3) > 1, "tiny target must create multiple blocks")
      assert(r.getLong(2) <= full.getOrElse(key, 0L),
        s"blocked census must be a subset at $key")
    }
    // determinism: the LCG blocking is stable across runs
    val again = graft.queries.Curation24Q.allenCensus(spark, dir, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(again == blocked.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
  }

  test("o23_timetravel: snapshot algebra — adds accumulate, removes retire") {
    val rows = SparkEntry.queries("o23_timetravel")(spark, dir)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 50)
    // closed form of the synthetic log: v+1 adds minus the removes
    // fired at versions 10,15,...,<=v
    rows.foreach { case (v, live, _) =>
      val removed = if (v < 10) 0L else (v - 10) / 5 + 1
      assert(live == v + 1 - removed, s"version $v: live $live")
    }
    // total_rows non-negative and bounded by the full table
    val total = graft.queries.Q.lineitem(spark, dir).count()
    assert(rows.forall(r => r._3 >= 0 && r._3 <= total))
  }

  test("o24_skew_audit: order statistics are consistent") {
    val r = SparkEntry.queries("o24_skew_audit")(spark, dir).collect()(0)
    val (nKeys, nRows, mx, p50, p99) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nKeys > 0 && nRows > 0)
    assert(p50 <= p99 && p99 <= mx, s"p50 $p50 <= p99 $p99 <= max $mx")
    assert(mx * nKeys >= nRows, "max*keys bounds total")
  }

  test("w64_period_detect: r bounded, at most one detected period") {
    val rows = SparkEntry.queries("w64_period_detect")(spark, dir)
      .collect()
    assert(rows.length == 48)
    rows.filter(!_.isNullAt(2)).foreach { r =>
      val v = r.getDouble(2)
      assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"r $v out of range")
    }
    assert(rows.count(_.getBoolean(3)) <= 1)
  }

  test("w58_attribution: matches a driver-side replay") {
    val got = SparkEntry.queries("w58_attribution")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    val ev = graft.io.Tables.eventsUs(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "ts_us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.filter(_._4 == "purchase").map { case (pid, u, ts, _) =>
      val clicks = ev.filter(e => e._4 == "click" && e._2 == u &&
        (e._3 < ts || (e._3 == ts && e._1 < pid)))
      pid -> (if (clicks.isEmpty) -1L
              else clicks.maxBy(e => (e._3, e._1))._1)
    }.toMap
    assert(got == expected, "last preceding click per purchase")
  }
}
