package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global order statistics — cumulative sums,
  * row_number, and ntile over a TOTAL order — without ever planning a
  * single-partition window.
  *
  * The reference's global sorts/ranks (AUC, quintile scores, gains
  * curves — the reference's analysis scripts) run inside one pandas
  * process; the naive
  * Spark translation, `Window.orderBy(...)` with no partition spec,
  * collapses to ONE task sorting the whole table — the textbook
  * 100 TB bottleneck. This is the classic two-pass fix:
  *
  *   1. freeze p-1 ordered bucket boundaries of a numeric bucket key
  *      (one `percentile_approx` job; boundaries become literals);
  *   2. assign each row a deterministic bucket id with pure column
  *      arithmetic over those literals — equal keys always land in
  *      the same bucket, so boundary PLACEMENT affects only load
  *      balance, never the result;
  *   3. aggregate per-bucket value totals (≤ p rows — cluster
  *      metadata, not data; fetched to the driver exactly like AQE's
  *      own shuffle statistics) and prefix-sum them into per-bucket
  *      offsets;
  *   4. window WITHIN each bucket (`Window.partitionBy(bucket)` —
  *      p-way parallel, spillable local sorts) and add the broadcast
  *      offset.
  *
  * Why not `repartitionByRange` + `spark_partition_id()`: the range
  * partitioner re-samples its boundaries per job (seeded by the RDD
  * id), so the totals pass and the final pass could disagree on
  * partition membership and the offsets would silently mis-align.
  * Literal boundaries make every pass agree by construction.
  *
  * Output is bitwise identical to the single-partition plan whenever
  * `order` is a total order — callers must include a unique
  * tiebreaker, as every graft call site already does.
  *
  * Key contract: `bucketKey` must be NULL-free, and a NaN key is
  * placed in the TOP bucket (Spark and DuckDB both sort NaN above
  * every finite double, but `key > boundary` is false for NaN, so
  * without the explicit guard NaN rows would mis-bucket to the
  * bottom and corrupt every downstream offset). No graft call site
  * can currently produce a NaN key (sigmoid scores, integer
  * lattices, hashes), but the guard makes the primitive safe for
  * ones that can.
  */
object DistRank {

  /** Order-congruent numeric bucket key for STRING sort columns: the
    * first 6 UTF-8 bytes left-justified into a 48-bit integer.
    * UTF-8 byte order equals Spark's UTF8String binary order, and the
    * left-justification (missing bytes = 0) keeps prefixes sorting
    * BELOW their extensions, so the mapping is monotone; strings
    * sharing a 6-byte prefix share a bucket, which only concentrates
    * load, never misorders (the in-bucket window sorts the rest). */
  def stringKey(c: Column): Column = {
    val b = substring(encode(c, "UTF-8"), 1, 6)
    coalesce(conv(hex(b), 16, 10).cast("double") *
      pow(lit(2.0), (lit(6) - length(b)) * lit(8)), lit(0.0))
  }

  /** Exact floor division of two positive LONG columns without the
    * double-typed `/`: (a - a % b) / b is an exact double (the
    * numerator is divisible by b) for quotients below 2^53 — far past
    * any row count. */
  private def ldiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Bucket id = #boundaries strictly below the key — monotone in the
    * key, equal keys share a bucket, pure codegen arithmetic. NaN
    * (which Spark orders ABOVE every finite double) goes to the top
    * bucket; the `>` comparisons alone would send it to bucket 0. */
  private def pidFor(key: Column, bounds: Seq[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else when(isnan(key), lit(bounds.size)).otherwise(
      bounds.map(b => when(key > lit(b), 1).otherwise(0)).reduce(_ + _))

  /** Structural backstop for the `parts = 1` fast path: true when the
    * frame's grain is bounded by an aggregation/dedup/constant
    * relation at its core — i.e. every path from the root to a leaf
    * passes through a row-collapsing node, with no row-multiplying
    * Generate above it. A joined pair of aggregates (the scalar
    * crossJoin pattern) still qualifies; a raw scan, or an exploded
    * aggregate, does not. This is a guard-rail, not a cardinality
    * proof — callers assert "this frame is aggregate-grain", and the
    * check turns a mistaken assertion into a plan-build failure that
    * PlanGuardSpec (which builds every registered query) surfaces. */
  private[graft] def boundedGrain(plan: LogicalPlan): Boolean = plan match {
    case _: Aggregate | _: Deduplicate | _: Distinct => true
    case _: LocalRelation | _: OneRowRelation => true
    case _: Generate => false
    case j: Join => boundedGrain(j.left) && boundedGrain(j.right)
    case u: Union => u.children.forall(boundedGrain)
    case other if other.children.length == 1 =>
      boundedGrain(other.children.head)
    case _ => false
  }

  /** Exact global cumulative sums (and optionally a global row
    * number) of `values` over the total order `order`.
    *
    * @param df        input frame (bucketKey/order columns non-null)
    * @param bucketKey numeric column ASC-congruent with `order`'s
    *                  leading column (negate a `desc` metric)
    * @param order     total order for the cumulation — MUST include a
    *                  unique tiebreaker
    * @param values    (column, outputName) pairs; each gains an exact
    *                  global running LONG sum named outputName
    * @param inclusive frame end: current row (true) or previous row
    *                  (false — exclusive prefix; 0 on the first row)
    * @param totalsSuffix if set, each value's grand total is appended
    *                  as a literal column named outputName+suffix —
    *                  replaces `sum(x).over(Window.partitionBy())`,
    *                  which is ALSO a single-partition window
    * @param rowNumberAs if set, an exact global 1-based row number
    *                  over `order` is appended under this name (LONG;
    *                  participates in totalsSuffix with total = N)
    */
  def cumsum(df: DataFrame, bucketKey: Column, order: Seq[Column],
      values: Seq[(Column, String)], inclusive: Boolean = true,
      totalsSuffix: Option[String] = None,
      rowNumberAs: Option[String] = None, parts: Int = 0,
      cacheInput: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (p == 1) require(boundedGrain(df.queryExecution.analyzed),
      "DistRank parts=1 fast path requires an aggregate-grain input " +
        "frame (the single-bucket window would otherwise one-task-sort " +
        "row-scale data); this frame's logical plan has a row-scale core")

    val keep = df.columns.toSeq
    val vals = (values.map { case (c, n) => (c, n, false) } ++
      rowNumberAs.map(n => (lit(1L), n, true)).toSeq).zipWithIndex
      .map { case ((c, n, isRn), i) => (c, n, s"__drv$i", isRn) }
    val tagged0 = df.select(
      (keep.map(col) :+ bucketKey.cast("double").as("__drk")) ++
        vals.map { case (c, _, t, _) => c.cast("long").as(t) }: _*)
    // The input chain is otherwise evaluated once per eager pass
    // (boundary sketch, per-bucket totals) AND again by the caller's
    // final action — for the common value-count inputs that is a
    // row-scale groupBy recomputed 3x. Cache the tagged frame when it
    // is provably aggregate-grain (bounded — a value lattice, never
    // row-scale data, so the footprint is compact at every SF) and at
    // least one eager pass exists to materialize it. Row-scale inputs
    // keep the uncached behavior: at 100 TB caching them is a
    // caller-level judgment (a102/a103 do it explicitly), not a
    // primitive default. boundedGrain is structural, not a
    // cardinality proof — a caller whose aggregate grain is itself
    // near row-scale (a101's cent-price value lattice) opts out with
    // cacheInput=false: there the cache build costs more than the one
    // recompute it saves, at every SF.
    val tagged =
      if (cacheInput && (p > 1 || totalsSuffix.nonEmpty) &&
          boundedGrain(df.queryExecution.analyzed)) tagged0.cache()
      else tagged0

    // Pass 0: freeze boundaries. ANY boundary set is correct (it only
    // balances load), so the approximate sketch is fine; distinct-ing
    // collapses heavy ties into one bucket, which an ordered
    // partitioning could not split anyway. parts=1 (the
    // aggregate-grain fast path) skips the sketch job outright.
    val qs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
    val bounds: Seq[Double] =
      if (p == 1) Nil
      else {
        val bRow = tagged
          .agg(percentile_approx(col("__drk"), qs, lit(2500)).as("b"))
          .head()
        if (bRow.isNullAt(0)) Nil
        else bRow.getSeq[Double](0).distinct.sorted
      }
    val bucketed = tagged.withColumn("__drp", pidFor(col("__drk"), bounds))

    // Pass 1: per-bucket totals — ≤ p rows of metadata. With a single
    // bucket the offsets are all zero, so the job is needed only when
    // the caller wants grand totals.
    val aggs = vals.map { case (_, _, t, _) => sum(col(t)).as(t) }
    val totRows: Array[Row] =
      if (p == 1 && totalsSuffix.isEmpty) Array.empty
      else bucketed.groupBy("__drp")
        .agg(aggs.head, aggs.tail: _*).collect()
    val byPid: Map[Int, Array[Long]] =
      if (totRows.isEmpty) Map(0 -> Array.fill(vals.size)(0L))
      else totRows.map { r =>
        r.getInt(0) -> vals.indices.map(i =>
          if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)).toArray
      }.toMap
    val pids = byPid.keys.toSeq.sorted
    val offsets = scala.collection.mutable.Map[Int, Array[Long]]()
    val running = Array.fill(vals.size)(0L)
    pids.foreach { pid =>
      offsets(pid) = running.clone()
      val t = byPid(pid)
      vals.indices.foreach(i => running(i) += t(i))
    }
    val grand: Array[Long] = running

    // Pass 2: bucket-local windows + a LITERAL offset lookup. The
    // offsets are ≤ p driver-known constants, so a codegen'd CASE
    // chain on the bucket id replaces the former broadcast-join —
    // one less exchange per call, and no join to degenerate into a
    // BroadcastNestedLoop when the single-bucket fast path makes the
    // key foldable.
    def offLookup(i: Int): Column = pids.foldLeft(lit(0L)) {
      case (acc, pid) =>
        when(col("__drp") === lit(pid), lit(offsets(pid)(i))).otherwise(acc)
    }
    val frameEnd = if (inclusive) 0L else -1L
    val w = Window.partitionBy("__drp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val withLocal = bucketed.select(
      (keep.map(col) :+ col("__drp")) ++
        vals.zipWithIndex.map { case ((_, _, t, _), i) =>
          coalesce(sum(col(t)).over(w), lit(0L)).as(s"__drl$i")
        }: _*)
    val outCols = keep.map(col) ++
      vals.zipWithIndex.map { case ((_, n, _, _), i) =>
        (col(s"__drl$i") + offLookup(i)).as(n)
      } ++
      totalsSuffix.toSeq.flatMap(suf =>
        vals.zipWithIndex.map { case ((_, n, _, _), i) =>
          lit(grand(i)).as(s"$n$suf")
        })
    withLocal.select(outCols: _*)
  }

  /** Exact global running MINIMUM of `values` over the total order
    * `order` — the two-pass [[cumsum]] shape with min in place of
    * sum: per-bucket minima are the ≤ p rows of driver metadata,
    * their exclusive prefix-min becomes the literal per-bucket
    * offset, and the final pass takes min(bucket-local running min,
    * offset). Values must be LONG-castable and non-null; the first
    * row's EXCLUSIVE min is Long.MaxValue (no predecessor — callers
    * test `isFirst` or compare against it). Powers order-scan
    * operators (2D skyline's "best y among strictly earlier x"),
    * never a single-partition window. */
  def cummin(df: DataFrame, bucketKey: Column, order: Seq[Column],
      values: Seq[(Column, String)], inclusive: Boolean = true,
      parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (p == 1) require(boundedGrain(df.queryExecution.analyzed),
      "DistRank parts=1 fast path requires an aggregate-grain input")
    val keep = df.columns.toSeq
    val vals = values.zipWithIndex.map { case ((c, n), i) =>
      (c, n, s"__dmv$i") }
    val tagged0 = df.select(
      (keep.map(col) :+ bucketKey.cast("double").as("__drk")) ++
        vals.map { case (c, _, t) => c.cast("long").as(t) }: _*)
    // same bounded-grain input cache as [[cumsum]] — two eager passes
    // plus the final plan otherwise recompute the input chain 3x
    val tagged =
      if (p > 1 && boundedGrain(df.queryExecution.analyzed)) tagged0.cache()
      else tagged0
    val qs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
    val bounds: Seq[Double] =
      if (p == 1) Nil
      else {
        val bRow = tagged
          .agg(percentile_approx(col("__drk"), qs, lit(2500)).as("b"))
          .head()
        if (bRow.isNullAt(0)) Nil
        else bRow.getSeq[Double](0).distinct.sorted
      }
    val bucketed = tagged.withColumn("__drp", pidFor(col("__drk"), bounds))
    val aggs = vals.map { case (_, _, t) => min(col(t)).as(t) }
    val minRows: Array[Row] =
      if (p == 1) Array.empty
      else bucketed.groupBy("__drp").agg(aggs.head, aggs.tail: _*)
        .collect()
    val byPid: Map[Int, Array[Long]] = minRows.map { r =>
      r.getInt(0) -> vals.indices.map(i =>
        if (r.isNullAt(i + 1)) Long.MaxValue else r.getLong(i + 1)).toArray
    }.toMap
    val pids = byPid.keys.toSeq.sorted
    val offsets = scala.collection.mutable.Map[Int, Array[Long]]()
    val running = Array.fill(vals.size)(Long.MaxValue)
    pids.foreach { pid =>
      offsets(pid) = running.clone()
      val m = byPid(pid)
      vals.indices.foreach(i => running(i) = math.min(running(i), m(i)))
    }
    def offLookup(i: Int): Column = pids.foldLeft(lit(Long.MaxValue)) {
      case (acc, pid) =>
        when(col("__drp") === lit(pid), lit(offsets(pid)(i))).otherwise(acc)
    }
    val frameEnd = if (inclusive) 0L else -1L
    val w = Window.partitionBy("__drp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val withLocal = bucketed.select(
      (keep.map(col) :+ col("__drp")) ++
        vals.zipWithIndex.map { case ((_, _, t), i) =>
          coalesce(min(col(t)).over(w), lit(Long.MaxValue))
            .as(s"__dml$i")
        }: _*)
    val outCols = keep.map(col) ++
      vals.zipWithIndex.map { case ((_, n, _), i) =>
        least(col(s"__dml$i"), offLookup(i)).as(n)
      }
    withLocal.select(outCols: _*)
  }

  /** Exact global 1-based row number over `order` — `cumsum` of a
    * constant 1. `totalAs`, if set, appends the total row count as a
    * literal column (feeds `ntileOf`). */
  def rowNumber(df: DataFrame, bucketKey: Column, order: Seq[Column],
      as: String, totalAs: Option[String] = None,
      parts: Int = 0): DataFrame = {
    val d = cumsum(df, bucketKey, order, Nil, inclusive = true,
      totalsSuffix = totalAs.map(_ => "__tot"), rowNumberAs = Some(as),
      parts = parts)
    totalAs match {
      case Some(t) => d.withColumnRenamed(s"${as}__tot", t)
      case None => d
    }
  }

  /** One global ranking to compute alongside others in a single
    * [[rowNumbers]] call: `bucketKey` must be ASC-congruent with
    * `order`'s leading column (same contract as [[cumsum]]), `order`
    * must be a total order, `as` names the output rank column. */
  final case class RankSpec(bucketKey: Column, order: Seq[Column],
      as: String)

  /** Several exact global row numbers over DIFFERENT total orders of
    * the SAME frame, fused: one boundary-sketch job computes every
    * order's bucket boundaries together, one metadata job counts the
    * bucket-id TUPLE (≤ p^k rows — for the k=3 quintile scores at
    * p=32 that is ≤ 32k rows of driver metadata, marginalized into
    * per-order offsets), and the final plan runs the k bucket-local
    * sort+window passes back to back over one scan — no per-order
    * re-read of the input and no k-way self-join on the row key.
    *
    * Replaces k independent [[rowNumber]] calls (2k eager jobs, k+1
    * computations of the input, k joins) for the RFM-style "rank the
    * same aggregate by several metrics" shape. Ranks are exact, so
    * the output is bitwise identical to the unfused form.
    *
    * @param totalAs if set, the total row count N is appended once as
    *                a literal column under this name (shared by every
    *                order — it is the same N).
    */
  def rowNumbers(df: DataFrame, specs: Seq[RankSpec],
      totalAs: Option[String] = None, parts: Int = 0): DataFrame = {
    require(specs.nonEmpty, "rowNumbers needs at least one RankSpec")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (p == 1) require(boundedGrain(df.queryExecution.analyzed),
      "DistRank parts=1 fast path requires an aggregate-grain input")
    val keep = df.columns.toSeq
    val js = specs.indices
    val tagged0 = df.select(keep.map(col) ++ specs.zip(js).map {
      case (sp, j) => sp.bucketKey.cast("double").as(s"__drk$j")
    }: _*)
    // same bounded-grain input cache as [[cumsum]]
    val tagged =
      if ((p > 1 || totalAs.isDefined) &&
          boundedGrain(df.queryExecution.analyzed)) tagged0.cache()
      else tagged0

    // Pass 0: every order's boundary sketch in ONE aggregate job.
    val qs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
    val boundsPer: Seq[Seq[Double]] =
      if (p == 1) js.map(_ => Nil)
      else {
        val aggCols = js.map(j =>
          percentile_approx(col(s"__drk$j"), qs, lit(2500)).as(s"b$j"))
        val row = tagged.agg(aggCols.head, aggCols.tail: _*).head()
        js.map(j =>
          if (row.isNullAt(j)) Nil
          else row.getSeq[Double](j).distinct.sorted)
      }
    val bucketed = tagged.select(keep.map(col) ++ js.map(j =>
      pidFor(col(s"__drk$j"), boundsPer(j)).as(s"__drp$j")): _*)

    // Pass 1: ONE count job over GROUPING SETS ((__drp0), ..,
    // (__drpk-1)) — each order's per-bucket marginal directly, ≤ k·p
    // rows of driver metadata. (The former bucket-id TUPLE count was
    // bounded only by min(p^k, distinct tuples) — row-scale in the
    // worst case at large k; the marginals are all the offsets ever
    // needed.) Every grouping set keys exactly one non-null column,
    // so rows attribute to their order by the non-null index.
    val needTotals = totalAs.isDefined
    val (offsetsPer: Seq[Map[Int, Long]], total: Long) =
      if (p == 1 && !needTotals) (js.map(_ => Map(0 -> 0L)), 0L)
      else {
        val cells: Array[Row] = bucketed
          .groupingSets(js.map(j => Seq(col(s"__drp$j"))),
            js.map(j => col(s"__drp$j")): _*)
          .agg(count(lit(1)).as("__n")).collect()
        val n = cells.filter(r => specs.size == 1 || !r.isNullAt(0))
          .map(_.getLong(specs.size)).sum
        val offs = js.map { j =>
          val marg = cells
            .filter(r => specs.size == 1 || !r.isNullAt(j))
            .map(r => r.getInt(j) -> r.getLong(specs.size)).toMap
          var run = 0L
          marg.keys.toSeq.sorted.map { pid =>
            val o = pid -> run; run += marg(pid); o
          }.toMap
        }
        (offs, n)
      }

    // Pass 2: k bucket-local windows over one scan, literal offsets.
    def offLookup(j: Int): Column = offsetsPer(j).keys.toSeq.sorted
      .foldLeft(lit(0L)) { (acc, pid) =>
        when(col(s"__drp$j") === lit(pid),
          lit(offsetsPer(j)(pid))).otherwise(acc)
      }
    val ranked = js.foldLeft(bucketed) { (d, j) =>
      val w = Window.partitionBy(s"__drp$j").orderBy(specs(j).order: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
      d.withColumn(specs(j).as,
        coalesce(sum(lit(1L)).over(w), lit(0L)) + offLookup(j))
    }
    ranked.select(keep.map(col) ++ specs.map(sp => col(sp.as)) ++
      totalAs.map(t => lit(total).as(t)).toSeq: _*)
  }

  /** All ADJACENT row pairs (row_i, row_{i+1}) of the total order
    * `order` — the operator behind exact sequential statistics
    * (Chatterjee's ξ, von Neumann ratios) whose terms touch each
    * consecutive pair once. Replaces the global-row-number self-join
    * shape (`pos` joined against itself shifted by one), which
    * computes the full input chain twice and shuffles a row-scale
    * hash join, with ONE bucket-local sort pass:
    *
    *   - within-bucket pairs: `lead()` over the cumsum Pass-2 window
    *     (bucket-local sort, p-way parallel, spillable);
    *   - the ≤ p−1 cross-boundary pairs: per-bucket first/last rows
    *     by `min_by`/`max_by` (aggregate-grain, ≤ p rows) joined to
    *     the next PRESENT bucket over a broadcast inequality —
    *     bounded metadata, entirely in-plan.
    *
    * Output: for each name in `cols`, `name` (row i) and `name_n`
    * (row i+1); exactly N−1 rows for an N-row input. `order` must be
    * an ASCENDING total order; `bucketKey` ASC-congruent with its
    * leading column and NULL-free (the [[cumsum]] contract — NaN
    * keys go to the top bucket). Build runs only the shared
    * boundary-sketch job.
    */
  def adjacentPairs(df: DataFrame, bucketKey: Column, order: Seq[Column],
      cols: Seq[String], parts: Int = 0): DataFrame = {
    require(cols.forall(c => !cols.contains(s"${c}_n")),
      s"adjacentPairs suffix collision: a requested column's '_n' pair " +
        s"name shadows another requested column (${cols.mkString(", ")})")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val oNames = order.indices.map(i => s"__do$i")
    val tagged0 = df.select(
      order.zip(oNames).map { case (c, n) => c.as(n) } ++
        cols.map(col) :+ bucketKey.cast("double").as("__drk"): _*)
    // same bounded-grain input cache as [[cumsum]]: the boundary
    // sketch, the in-bucket pass and the bucket-ends aggregate
    // otherwise each recompute the input chain
    val tagged =
      if (p > 1 && boundedGrain(df.queryExecution.analyzed)) tagged0.cache()
      else tagged0
    val qs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
    val bounds: Seq[Double] =
      if (p == 1) Nil
      else {
        val bRow = tagged
          .agg(percentile_approx(col("__drk"), qs, lit(2500)).as("b"))
          .head()
        if (bRow.isNullAt(0)) Nil
        else bRow.getSeq[Double](0).distinct.sorted
      }
    val bucketed = tagged.withColumn("__drp", pidFor(col("__drk"), bounds))
    val w = Window.partitionBy("__drp").orderBy(oNames.map(col): _*)
    val ordStruct = struct(oNames.map(col): _*)
    val payload = struct(cols.map(col): _*)
    val inBucket = bucketed
      .withColumn("__dnext", lead(payload, 1).over(w))
      .filter(col("__dnext").isNotNull)
      .select(cols.map(col) ++
        cols.map(c => col(s"__dnext.$c").as(s"${c}_n")): _*)
    // bucket ends: the total order makes ordStruct unique, so
    // min_by/max_by are deterministic
    val ends = bucketed.groupBy("__drp").agg(
      min_by(payload, ordStruct).as("__first"),
      max_by(payload, ordStruct).as("__last"))
    val lasts = ends.select(col("__drp").as("__pa"), col("__last"))
    val firsts = ends.select(col("__drp").as("__pb"), col("__first"))
    // next PRESENT bucket (ids are sparse when buckets are empty):
    // a ≤ p-row broadcast inequality join, then keep the minimal
    // successor per bucket
    // group by the bucket id alone (never the payload struct —
    // grouping keys get -0.0-normalized); __last is constant within
    // a group, carried through min_by
    val boundary = lasts
      .join(broadcast(firsts), col("__pb") > col("__pa"))
      .groupBy(col("__pa"))
      .agg(min_by(col("__first"), col("__pb")).as("__first"),
        min_by(col("__last"), col("__pb")).as("__last"))
      .select(cols.map(c => col(s"__last.$c").as(c)) ++
        cols.map(c => col(s"__first.$c").as(s"${c}_n")): _*)
    inBucket.union(boundary)
  }

  /** ANSI ntile from an exact global rank: with N rows and n buckets,
    * the first N mod n buckets hold N/n + 1 rows, the rest N/n — the
    * same arithmetic Spark's and DuckDB's NTile evaluate, but over
    * the distributed rank. */
  def ntileOf(rank: Column, total: Column, n: Int): Column = {
    val nL = lit(n.toLong)
    val size = ldiv(total, nL)
    val rem = pmod(total, nL)
    val fat = rem * (size + 1L)
    when(rank <= fat, ldiv(rank - 1L, size + 1L) + 1L)
      .otherwise(rem + ldiv(rank - fat - 1L, size) + 1L)
  }
}
