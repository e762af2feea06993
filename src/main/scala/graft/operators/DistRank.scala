package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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
      rowNumberAs: Option[String] = None, parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val keep = df.columns.toSeq
    val vals = (values.map { case (c, n) => (c, n, false) } ++
      rowNumberAs.map(n => (lit(1L), n, true)).toSeq).zipWithIndex
      .map { case ((c, n, isRn), i) => (c, n, s"__drv$i", isRn) }
    val tagged = df.select(
      (keep.map(col) :+ bucketKey.cast("double").as("__drk")) ++
        vals.map { case (c, _, t, _) => c.cast("long").as(t) }: _*)

    // Pass 0: freeze boundaries. ANY boundary set is correct (it only
    // balances load), so the approximate sketch is fine; distinct-ing
    // collapses heavy ties into one bucket, which an ordered
    // partitioning could not split anyway.
    val qs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
    val bRow = tagged
      .agg(percentile_approx(col("__drk"), qs, lit(2500)).as("b"))
      .head()
    val bounds: Seq[Double] =
      if (bRow.isNullAt(0)) Nil
      else bRow.getSeq[Double](0).distinct.sorted
    // bucket id = #boundaries strictly below the key — monotone in
    // the key, equal keys share a bucket, pure codegen arithmetic.
    val pidExpr =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("__drk") > lit(b), 1).otherwise(0))
        .reduce(_ + _)
    val bucketed = tagged.withColumn("__drp", pidExpr)

    // Pass 1: per-bucket totals — ≤ p rows of metadata.
    val aggs = vals.map { case (_, _, t, _) => sum(col(t)).as(t) }
    val totRows: Array[Row] = bucketed.groupBy("__drp")
      .agg(aggs.head, aggs.tail: _*).collect()
    val byPid: Map[Int, Array[Long]] = totRows.map { r =>
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

    // Pass 2: bucket-local windows + broadcast offset join.
    val offSchema = StructType(StructField("__drp", IntegerType) +:
      vals.indices.map(i => StructField(s"__dro$i", LongType)))
    val offDf = spark.createDataFrame(
      pids.map(pid => Row.fromSeq(pid +: offsets(pid).toSeq)).asJava,
      offSchema)
    val frameEnd = if (inclusive) 0L else -1L
    val w = Window.partitionBy("__drp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val withLocal = bucketed.select(
      (keep.map(col) :+ col("__drp")) ++
        vals.zipWithIndex.map { case ((_, _, t, _), i) =>
          coalesce(sum(col(t)).over(w), lit(0L)).as(s"__drl$i")
        }: _*)
    val joined = withLocal.join(broadcast(offDf), "__drp")
    val outCols = keep.map(col) ++
      vals.zipWithIndex.map { case ((_, n, _, _), i) =>
        (col(s"__drl$i") + col(s"__dro$i")).as(n)
      } ++
      totalsSuffix.toSeq.flatMap(suf =>
        vals.zipWithIndex.map { case ((_, n, _, _), i) =>
          lit(grand(i)).as(s"$n$suf")
        })
    joined.select(outCols: _*)
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
