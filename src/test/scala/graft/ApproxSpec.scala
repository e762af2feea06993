package graft

import org.apache.spark.sql.functions._

/** The approximate-aggregate toolbox for 100 TB work: algorithms are
  * engine-specific (HLL++, GK quantiles) so there is no cross-engine
  * oracle — correctness here means bounded error vs the exact answer
  * plus determinism for a fixed input, asserted on the driver's own
  * testdata.
  */
class ApproxSpec extends SparkSpec {

  private lazy val events = graft.io.Tables.events(spark, "/root/testdata/sf0.001")

  test("approx_count_distinct within rsd bound of exact distinct") {
    val r = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx"))
      .head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx brackets the exact interpolated percentile") {
    val r = events.agg(
      percentile(col("value"), lit(0.5)).as("exact_p50"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_p50"),
      min("value").as("lo"), max("value").as("hi"))
      .head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    val span = r.getDouble(3) - r.getDouble(2)
    assert(math.abs(approx - exact) < 0.01 * span,
      s"approx $approx vs exact $exact (span $span)")
  }

  test("approx aggregates are deterministic for a fixed input") {
    def run() = events.agg(
      approx_count_distinct(col("user_id"), 0.05),
      percentile_approx(col("value"), lit(0.9), lit(1000))).head()
    assert(run() == run())
  }
}
