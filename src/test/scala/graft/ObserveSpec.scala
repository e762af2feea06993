package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Spark's `observe()` API: data-quality counters collected DURING a
  * job (accumulator-backed — no second pass over the data), the
  * in-flight metrics hook a 100 TB pipeline uses instead of re-running
  * validation aggregates.
  */
class ObserveSpec extends SparkSpec {

  test("observe collects row/null/threshold metrics in one pass") {
    val obs = Observation("quality")
    val e = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("value") > 400, 1L).otherwise(0L)).as("n_high"))
    // one action drives BOTH the real output and the metrics
    val outRows = e.groupBy("event_type").count().collect().map(_.getLong(1)).sum
    val m = obs.get
    assert(m("n_rows") == outRows)
    // cross-check against directly computed aggregates
    val direct = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .agg(sum(when(col("value").isNull, 1L).otherwise(0L)),
        sum(when(col("value") > 400, 1L).otherwise(0L)))
      .head()
    assert(m("n_null") == direct.getLong(0) && m("n_high") == direct.getLong(1))
  }
}
