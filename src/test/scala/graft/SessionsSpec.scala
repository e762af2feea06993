package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessions

/** Semantics goldens for the batch event-sequence analytics
  * (operators/Sessions.scala): sessionization gap boundaries,
  * retention offsets, strict funnel ordering.
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 100L // micros, for readability

  test("sessionize: gap strictly greater than gapUs starts a session") {
    // user 1: gaps of exactly 100 (same session) and 101 (new session)
    val df = Seq(
      (1L, 0L, 10L), (1L, 100L, 11L), (1L, 201L, 12L),
      (2L, 5L, 20L)
    ).toDF("user_id", "ts_us", "event_id")
    val got = Sessions.sessionize(df, col("user_id"), col("ts_us"),
        col("event_id"), gap)
      .select("user_id", "ts_us", "session_idx")
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 0L, 1L), (1L, 100L, 1L), (1L, 201L, 2L),
      (2L, 5L, 1L)))
  }

  test("sessionize: equal timestamps break ties by event id deterministically") {
    val df = Seq((1L, 0L, 2L), (1L, 0L, 1L), (1L, 500L, 3L))
      .toDF("user_id", "ts_us", "event_id")
    val got = Sessions.sessionize(df, col("user_id"), col("ts_us"),
        col("event_id"), gap)
      .select("event_id", "session_idx").as[(Long, Long)].collect().sorted
    // both ts=0 rows share session 1 regardless of input order;
    // ts=500 is a new session (gap 500 > 100)
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("sessionSummary: bounds, duration, counts") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 400L, 3L)
    ).toDF("user_id", "ts_us", "event_id")
    val got = Sessions.sessionSummary(df, col("user_id"), col("ts_us"),
        col("event_id"), gap)
      .select("key", "session_idx", "n_events", "start_us", "end_us",
        "duration_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 0L, 50L, 50L),
      (1L, 2L, 1L, 400L, 400L, 0L)))
  }

  test("retention: offsets measured from each key's first bucket") {
    val df = Seq(
      (1L, 10L), (1L, 10L), (1L, 12L), // cohort 10, offsets 0 and 2
      (2L, 11L) // cohort 11, offset 0
    ).toDF("user_id", "week")
    val got = Sessions.retention(df, col("user_id"), col("week"))
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((10L, 0L, 1L), (10L, 2L, 1L), (11L, 0L, 1L)))
  }

  test("funnel: strict ordering — stage counts only at-or-after the previous stage") {
    val df = Seq(
      // user 1: full ordered funnel
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // user 2: purchase BEFORE click → purchase must not count
      (2L, 0L, "view"), (2L, 10L, "purchase"), (2L, 20L, "click"),
      // user 3: click with no view → neither counts
      (3L, 0L, "click"),
      // user 4: click at the same ts as view (>= boundary) counts
      (4L, 0L, "view"), (4L, 0L, "click")
    ).toDF("user_id", "ts_us", "event_type")
    val got = Sessions.funnel(df, Seq(col("user_id")), col("ts_us"),
        col("event_type"), Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "view", 3L), (1L, "click", 3L), (2L, "purchase", 1L)))
  }

  test("plan proof: sessionize + summary ride ONE data exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = (1 to 400).map(i => ((i % 7).toLong, (i * 37L) % 1000, i.toLong))
      .toDF("user_id", "ts_us", "event_id")
    // plan inspected pre-execution with AQE off — query stages hide
    // the exchange nodes otherwise (same recipe as ScaleTechniquesSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Sessions.sessionSummary(df, col("user_id"), col("ts_us"),
        col("event_id"), 50L)
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e }
      // window partitionBy(user) + groupBy(user, session_idx): the
      // group-by clustering is satisfied by the window's hash
      // partitioning on the coarser key — no second exchange.
      assert(shuffles.size == 1,
        s"sessionSummary must reuse the window exchange, found ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan proof: 3-stage funnel rides ONE data exchange (+ 1-row final agg)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = (1 to 400).map(i => ((i % 7).toLong, (i * 37L) % 1000,
      Seq("view", "click", "purchase")(i % 3))).toDF("user_id", "ts_us", "event_type")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Sessions.funnel(df, Seq(col("user_id")), col("ts_us"),
        col("event_type"), Seq("view", "click", "purchase"))
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e }
      // all three stage windows + the per-key groupBy share the key
      // partitioning (1 exchange); the global stage-count agg adds one
      // single-partition exchange of ONE row per task.
      assert(shuffles.size == 2,
        s"funnel must not re-shuffle the data per stage, found ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan proof: sessionize ∘ funnel composition keeps ONE data exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = (1 to 400).map(i => ((i % 7).toLong, (i * 37L) % 1000, i.toLong,
      Seq("view", "click", "purchase")(i % 3)))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sess = Sessions.sessionize(df, col("user_id"), col("ts_us"),
        col("event_id"), 50L)
      val out = Sessions.funnel(sess,
        Seq(col("user_id"), col("session_idx")),
        col("ts_us"), col("event_type"), Seq("view", "click", "purchase"))
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e }
      // sessionize's hashpartitioning(user_id) satisfies every funnel
      // window/group-by on (user_id, session_idx) because the keys
      // are plain columns — 1 data exchange + the 1-row global agg.
      // (A struct(user_id, session_idx) key defeats the subset check
      // and costs a full second shuffle — the funnel signature takes
      // Seq[Column] precisely to prevent that.)
      assert(shuffles.size == 2,
        s"composition must reuse sessionize's exchange, found ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("batch sessionize == built-in session_window on real events (4h gap)") {
    // session_window starts a new session at gap >= G (half-open
    // [start, last+G)); the batch operator at gap > G-1us is the
    // identical predicate on integer micros. Compare the per-session
    // (first event, count) multisets per user.
    val gapUs = 4L * 3600L * 1000000L
    val e = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
    val viaWindow = e.groupBy(col("user_id"),
        session_window(col("ts"), "4 hours"))
      .agg(min(col("event_id")).as("first_id"), count(lit(1)).as("n"))
      .select("user_id", "first_id", "n")
      .as[(Long, Long, Long)].collect().toSet
    val viaBatch = Sessions.sessionize(e, col("user_id"), col("ts_us"),
        col("event_id"), gapUs - 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("event_id")).as("first_id"), count(lit(1)).as("n"))
      .select("user_id", "first_id", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaBatch.nonEmpty && viaBatch == viaWindow)
  }

  test("funnel: later qualifying click re-opens the purchase window") {
    // user's first click is before view (doesn't qualify); the second
    // click, after view, does — purchase after THAT click counts.
    val df = Seq(
      (1L, 0L, "click"), (1L, 5L, "view"), (1L, 10L, "click"),
      (1L, 15L, "purchase")
    ).toDF("user_id", "ts_us", "event_type")
    val got = Sessions.funnel(df, Seq(col("user_id")), col("ts_us"),
        col("event_type"), Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "view", 1L), (1L, "click", 1L), (2L, "purchase", 1L)))
  }
}
