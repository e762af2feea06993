package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Scored, TopKAgg}

/** The typed mergeable top-k aggregate: equivalence with the window
  * rank, merge-order invariance, and the partial-aggregation plan
  * shape that is its reason to exist.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 500).map(i =>
    ((i % 7).toLong, ((i * 2654435761L) % 1000).toDouble, i.toLong))
    .toDF("g", "v", "id")

  test("matches the window-rank top-k (value desc, id asc)") {
    val topk = udaf(new TopKAgg(3))
    val viaAgg = data.groupBy("g").agg(topk(col("v"), col("id")).as("ids"))
      .as[(Long, String)].collect().toMap
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val viaWindow = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("g")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("id")))),
        s => s.getField("id").cast("string")), ":").as("ids"))
      .as[(Long, String)].collect().toMap
    assert(viaAgg == viaWindow)
  }

  test("merge is order-invariant and respects the total order") {
    val agg = new TopKAgg(2)
    val a = Seq(Scored(5.0, 10), Scored(3.0, 11))
    val b = Seq(Scored(5.0, 2), Scored(4.0, 7))
    // ties on v=5.0 break by id ASC: keep id 2 then id 10... then 4.0
    assert(agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a)))
    assert(agg.finish(agg.merge(a, b)) == "2:10")
  }

  test("NaN scores order deterministically (largest-first), any arrival order") {
    val agg = new TopKAgg(2)
    val xs = Seq(Scored(Double.NaN, 9), Scored(7.0, 1), Scored(5.0, 2))
    // reduce in every arrival order and merge in both directions:
    // java.lang.Double.compare ranks NaN above every real value, and
    // the skip-check agrees with the sort — so the kept set is stable.
    val viaReduce = xs.permutations.map(p =>
      agg.finish(p.foldLeft(agg.zero)(agg.reduce))).toSet
    val (l, r) = (Seq(Scored(Double.NaN, 9)), Seq(Scored(7.0, 1), Scored(5.0, 2)))
    assert(viaReduce == Set("9:1"))
    assert(agg.finish(agg.merge(l, r)) == "9:1")
    assert(agg.finish(agg.merge(r, l)) == "9:1")
  }

  test("plan proof: partial top-k runs before the exchange") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val topk = udaf(new TopKAgg(3))
      val out = data.groupBy("g").agg(topk(col("v"), col("id")))
      val plan = out.queryExecution.executedPlan
      val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      // two-phase aggregate (partial below the exchange, final above):
      // the map side trims to k per group BEFORE any row moves.
      assert(aggs.size == 2 && shuffles.size == 1,
        s"expected partial+final around one exchange, got ${aggs.size} aggs / ${shuffles.size} shuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
