package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-sequence analytics: gap-based sessionization, cohort
  * retention, and staged funnels (net-new vs the reference — the
  * event-log counterparts of its per-entity frame windows, SURVEY
  * §2.11). The streaming twin of sessionize is `w9_session`
  * (session_window + watermark); this is the reprocessing/backfill
  * path over the same data.
  *
  * Scale shape: every function here shuffles ONCE on the entity key —
  * all windows share `partitionBy(key)`, and the follow-up aggregates
  * group by `(key, …)` which Catalyst satisfies with the same
  * exchange. Timestamps are integer microseconds end-to-end (epoch_us
  * domain): a 100 TB event log has ts values whose nanos exceed
  * 2^53, so none of this math may route through doubles.
  */
object Sessions {

  /** Adds `session_idx` (1-based per key): a new session starts when
    * the gap since the previous event exceeds `gapUs`. The ordering
    * must be total — pass a unique `tieBreak` (event id) so rows with
    * equal timestamps sessionize deterministically under shuffle.
    */
  def sessionize(df: DataFrame, key: Column, tsUs: Column,
                 tieBreak: Column, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsUs, tieBreak)
    val gap = tsUs - lag(tsUs, 1).over(w)
    val isNew = when(gap.isNull || gap > lit(gapUs), 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session summary after [[sessionize]]: bounds, duration and
    * event count, grouped on (key, session_idx). One shuffle total —
    * the session grouping reuses the sessionize exchange.
    */
  def sessionSummary(df: DataFrame, key: Column, tsUs: Column,
                     tieBreak: Column, gapUs: Long): DataFrame =
    sessionize(df, key, tsUs, tieBreak, gapUs)
      .groupBy(key.as("key"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(tsUs).as("start_us"),
        max(tsUs).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** Cohort retention: cohort = the key's first activity bucket
    * (e.g. epoch-week), output = distinct keys active per
    * (cohort, offset). `bucket` must be an integer column. Two
    * aggregations, both keyed coarser than or equal to `key` — the
    * distinct-count shuffle is on (cohort, offset), tiny.
    */
  def retention(df: DataFrame, key: Column, bucket: Column): DataFrame = {
    val cohort = min(bucket).over(Window.partitionBy(key))
    df.select(key.as("key"), bucket.as("bucket"),
        cohort.as("cohort"))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(countDistinct(col("key")).as("n_active"))
  }

  /** Strictly-ordered funnel: per key, stage i counts only if its
    * first occurrence is at-or-after the first qualifying occurrence
    * of stage i-1. Returns one row per stage with the surviving key
    * count — the standard conversion-funnel semantics. All stages
    * ride ONE window partition (one shuffle); the final count is a
    * tiny global agg.
    *
    * `keys` is a Seq of PLAIN columns (not a struct expression): the
    * exchange-reuse check recognizes that hash partitioning on a key
    * PREFIX satisfies clustering on (prefix, more) only for flat
    * column lists — wrapping the key in a struct forces a second
    * full-data shuffle when composing with an upstream window (e.g.
    * sessionize), which is exactly what this signature avoids.
    */
  def funnel(df: DataFrame, keys: Seq[Column], tsUs: Column, typ: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(keys.nonEmpty, "funnel needs at least one key column")
    val keyNames = keys.indices.map(i => s"k_$i")
    val keyCols = keyNames.map(col)
    val w = Window.partitionBy(keyCols: _*)
    // first_i = min ts of stage i with ts >= first_{i-1}. Window
    // functions cannot nest, so each stage threshold is materialized
    // as a column before the next references it — every Window node
    // shares the same partition key, so Catalyst plans ONE exchange
    // for the whole chain. Null upstream first ⇒ `ts >= null` is
    // null ⇒ min sees nothing ⇒ downstream stages stay null too.
    val base = df.select(keys.zip(keyNames).map { case (k, n) => k.as(n) }
      ++ Seq(tsUs.as("ts"), typ.as("typ")): _*)
    val withFirsts = stages.zipWithIndex.foldLeft(base) {
      case (cur, (stage, i)) =>
        val qualifies =
          if (i == 0) col("typ") === stage
          else col("typ") === stage && col("ts") >= col(s"first_${i - 1}")
        cur.withColumn(s"first_$i",
          min(when(qualifies, col("ts"))).over(w))
    }
    val perKey = withFirsts.groupBy(keyCols: _*)
      .agg(max(col("first_0")).as("first_0"),
        (1 until stages.size).map(i =>
          max(col(s"first_$i")).as(s"first_$i")): _*)
    val counts = stages.indices.map(i =>
      sum(when(col(s"first_$i").isNotNull, 1L).otherwise(0L))
        .as(s"n_$i"))
    val agg = perKey.agg(counts.head, counts.tail: _*)
    // unpivot to (stage_idx, stage, n_keys) rows
    val stageExprs = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i).cast("long").as("stage_idx"), lit(stage).as("stage"),
        col(s"n_$i").as("n_keys"))
    }
    agg.select(explode(array(stageExprs: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_keys"))
  }
}
