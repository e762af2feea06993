package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Obs, StreamingTemporal}

/** Streaming temporal operators: state must carry EXACTLY the batch
  * semantics across micro-batch boundaries. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches[T](query: org.apache.spark.sql.Dataset[T],
                            name: String,
                            feed: MemoryStream[Obs],
                            batches: Seq[Seq[Obs]]): Unit = {
    val q = query.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => feed.addData(b); q.processAllAvailable() }
    } finally q.stop()
  }

  test("streaming EMA continues the recursion across micro-batches") {
    implicit val sq = spark.sqlContext
    val feed = MemoryStream[Obs]
    val out = StreamingTemporal.emaStream(feed.toDS(), alpha = 0.5)
    runBatches(out, "ema_out", feed, Seq(
      Seq(Obs("a", 1, 1, 10.0), Obs("a", 2, 2, 20.0)),
      Seq(Obs("a", 3, 3, 30.0), Obs("b", 1, 4, 7.0))))
    val r = spark.table("ema_out").orderBy("key", "ts")
      .select("ema").as[Double].collect()
    // batch-equivalent recursion: 10, 15, 22.5 for a; 7 for b
    assert(approx(r(0), 10.0) && approx(r(1), 15.0) && approx(r(2), 22.5))
    assert(approx(r(3), 7.0))
  }

  test("streaming CUSUM continues the integer recursion across micro-batches") {
    implicit val sq = spark.sqlContext
    val feed = MemoryStream[Obs]
    val out = StreamingTemporal.cusumStream(feed.toDS(), allowance = 1000L)
    runBatches(out, "cusum_out", feed, Seq(
      Seq(Obs("a", 1, 1, 30.0), Obs("a", 2, 2, 5.0)),   // cents 3000, 500
      Seq(Obs("a", 3, 3, 40.0), Obs("b", 1, 4, 2.0))))  // cents 4000, 200
    val r = spark.table("cusum_out").orderBy("key", "ts")
      .select("cusum").as[Long].collect()
    // a: max(0,0+2000)=2000; max(0,2000-500)=1500; max(0,1500+3000)=4500
    // b: max(0,0-800)=0
    assert(r.toSeq == Seq(2000L, 1500L, 4500L, 0L),
      s"state must continue across batches: ${r.toSeq}")
  }

  test("transformWithState: running count/max continues across micro-batches") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val feed = MemoryStream[Obs]
      val out = feed.toDS().groupByKey(_.key)
        .transformWithState(new graft.streaming.KeyStatsProcessor,
          TimeMode.None(), OutputMode.Append())
      runBatches(out, "tws_out", feed, Seq(
        Seq(Obs("a", 1, 1, 10.0), Obs("a", 2, 2, 30.0)),
        Seq(Obs("a", 3, 3, 20.0), Obs("b", 1, 4, 7.0))))
      // append mode emits one row per key per batch; the LAST row per
      // key carries the full running state (RocksDB ValueState)
      val r = spark.table("tws_out").groupBy("key")
        .agg(max("n").as("n"), max("max_value").as("mx"))
        .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2)))
        .toMap
      assert(r("a") == (3L, 30.0), s"state must continue across batches: $r")
      assert(r("b") == (1L, 7.0))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState top-k: ListState continues and trims across batches") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val feed = MemoryStream[Obs]
      val out = feed.toDS().groupByKey(_.key)
        .transformWithState(new graft.streaming.TopKProcessor(2),
          TimeMode.None(), OutputMode.Append())
      runBatches(out, "topk_out", feed, Seq(
        Seq(Obs("a", 1, 1, 10.0), Obs("a", 2, 2, 30.0), Obs("a", 3, 3, 20.0)),
        // 25 displaces 20; a value tie (30) loses to the lower id 2
        Seq(Obs("a", 4, 4, 25.0), Obs("a", 5, 5, 30.0))))
      // last batch's emission is the final top-2 (value DESC, id ASC)
      val last = spark.table("topk_out").filter(col("id").isin(2L, 5L, 4L))
        .groupBy("id").agg(max("rnk").as("rnk"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(last(2L) == 1, s"id 2 (30.0, lower id) must stay rank 1: $last")
      assert(last(5L) == 2, s"id 5 (30.0) must take rank 2: $last")
      assert(!last.contains(4L) || last(4L) > 2,
        s"25.0 must be displaced by the second 30.0: $last")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState timers: idle session closes via handleExpiredTimer only") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val feed = MemoryStream[Obs]
      val H = 3600L * 1000000L
      // event-time mode needs a watermarked timestamp on the input;
      // the micros long round-trips through timestamp_micros exactly
      val withTime = feed.toDS()
        .withColumn("ets", timestamp_micros(col("ts")))
        .withWatermark("ets", "0 seconds")
        .select(col("key"), col("ts"), col("id"), col("value")).as[Obs]
      val out = withTime.groupByKey(_.key)
        .transformWithState(
          new graft.streaming.SessionTimerProcessor(60L * 1000000L),
          TimeMode.EventTime(), OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("timer_out")
        .outputMode("append").start()
      try {
        feed.addData(Seq(Obs("a", 1000000L, 1, 10.0), Obs("a", 2000000L, 2, 5.0)))
        q.processAllAvailable()
        assert(spark.table("timer_out").isEmpty,
          "a's session is still open — nothing may be emitted yet")
        // advance the watermark far past a's 60s idle timer via a
        // DIFFERENT key; a gets NO further input, so only the timer
        // can close its session
        feed.addData(Seq(Obs("b", 10 * H, 3, 1.0)))
        q.processAllAvailable()
        feed.addData(Seq(Obs("b", 10 * H + 1000000L, 4, 2.0)))
        q.processAllAvailable()
        val rows = spark.table("timer_out")
          .select("key", "session_first", "n_events", "sum_cents")
          .as[(String, Long, Long, Long)].collect().toSet
        assert(rows == Set(("a", 1L, 2L, 1500L)),
          s"timer must close a's session (and only a's): $rows")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState MapState: per-category counts continue across batches") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      import graft.streaming.TypedObs
      val feed = MemoryStream[TypedObs]
      val out = feed.toDS().groupByKey(_.key)
        .transformWithState(new graft.streaming.TypeCountsProcessor,
          TimeMode.None(), OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("tc_out")
        .outputMode("append").start()
      try {
        feed.addData(Seq(TypedObs("a", "x", 1), TypedObs("a", "y", 2)))
        q.processAllAvailable()
        feed.addData(Seq(TypedObs("a", "x", 3), TypedObs("b", "x", 4)))
        q.processAllAvailable()
      } finally q.stop()
      val r = spark.table("tc_out").groupBy("key", "typ")
        .agg(max("n").as("n")).collect()
        .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
      assert(r(("a", "x")) == 2L, s"x count must continue across batches: $r")
      assert(r(("a", "y")) == 1L)
      assert(r(("b", "x")) == 1L)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("foreachBatch idempotent upsert: a replayed batch leaves the sink unchanged") {
    implicit val sq = spark.sqlContext
    // the exactly-once sink recipe foreachBatch demands of its
    // implementer: key-upsert + batchId ledger, so a retried batch
    // (the at-least-once delivery case) is a no-op
    val target = scala.collection.concurrent.TrieMap[Long, Double]()
    val committed = scala.collection.concurrent.TrieMap[Long, Boolean]()
    def upsert(df: org.apache.spark.sql.Dataset[Obs], batchId: Long): Unit =
      if (committed.putIfAbsent(batchId, true).isEmpty)
        df.collect().foreach(o => target(o.id) = o.value)
    val feed = MemoryStream[Obs]
    val q = feed.toDS().writeStream.foreachBatch(upsert _).start()
    try {
      feed.addData(Seq(Obs("a", 1, 1, 10.0), Obs("a", 2, 2, 20.0)))
      q.processAllAvailable()
      feed.addData(Seq(Obs("a", 3, 1, 11.0))) // upsert of key 1
      q.processAllAvailable()
      val snapshot = target.toMap
      assert(snapshot == Map(1L -> 11.0, 2L -> 20.0),
        s"upsert semantics: $snapshot")
      // simulate the engine redelivering batch 0 after a failure
      import spark.implicits._
      upsert(Seq(Obs("a", 1, 1, 10.0), Obs("a", 2, 2, 20.0)).toDS(), 0L)
      assert(target.toMap == snapshot,
        "replaying a committed batchId must not change the sink")
    } finally q.stop()
  }

  test("streaming rolling mean keeps only k values of state") {
    implicit val sq = spark.sqlContext
    val feed = MemoryStream[Obs]
    val out = StreamingTemporal.rollingMeanStream(feed.toDS(), k = 2)
    runBatches(out, "roll_out", feed, Seq(
      Seq(Obs("a", 1, 1, 1.0)),
      Seq(Obs("a", 2, 2, 3.0), Obs("a", 3, 3, 5.0))))
    val r = spark.table("roll_out").orderBy("ts")
      .select("roll_mean", "roll_n").collect()
    assert(approx(r(0).getDouble(0), 1.0) && r(0).getInt(1) == 1)
    assert(approx(r(1).getDouble(0), 2.0) && r(1).getInt(1) == 2)
    assert(approx(r(2).getDouble(0), 4.0) && r(2).getInt(1) == 2) // window slid
  }

  test("streaming dedup with watermark drops late duplicates") {
    implicit val sq = spark.sqlContext
    val feed = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val deduped = feed.toDS().toDF("ts", "id", "v")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      feed.addData(Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2L, 2.0)))
      q.processAllAvailable()
      feed.addData(Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 1L, 99.0), // dup id
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 3L, 3.0)))
      q.processAllAvailable()
      val r = spark.table("dedup_out").orderBy("id")
        .select("id", "v").collect()
      assert(r.map(_.getLong(0)).toList == List(1L, 2L, 3L))
      assert(r(0).getDouble(1) == 1.0) // first occurrence kept
    } finally q.stop()
  }

  test("windowed mean with watermark aggregates by event-time window") {
    implicit val sq = spark.sqlContext
    val feed = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = feed.toDS().toDF("ts", "k", "v")
    val q = StreamingTemporal.windowedMean(df, "ts", "v", "k", "10 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      feed.addData(Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "a", 4.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:15"), "a", 9.0)))
      q.processAllAvailable()
      val r = spark.table("win_out").orderBy("window.start")
        .select("mean_value", "n").collect()
      assert(r.length == 2)
      assert(approx(r(0).getDouble(0), 3.0) && r(0).getLong(1) == 2)
      assert(approx(r(1).getDouble(0), 9.0) && r(1).getLong(1) == 1)
    } finally q.stop()
  }
}
