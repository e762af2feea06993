package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.Skew

/** The 100 TB toolbox has to be provably shuffle-correct, not just
  * asserted: salted join equivalence, bucketed co-located join with
  * NO exchange in the physical plan, broadcast pinning. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join (inner and left), skewed key intact") {
    // 90% of large rows share one hot key.
    val large = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble))
      .toDF("k", "v")
    val small = Seq(("HOT", 1), ("k1", 2), ("k3", 3), ("absent", 9))
      .toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val plain = large.join(small, Seq("k"), jt)
      val salted = Skew.saltedJoin(large, small, Seq("k"), factor = 8, joinType = jt)
      assert(salted.count() == plain.count(), jt)
      assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0, jt)
    }
  }

  test("bucketed tables co-locate: join plan has NO shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 5000L).map(i => (i, i * 2.0)).toDF("id", "va")
      val b = (1L to 5000L).map(i => (i, s"s$i")).toDF("id", "vb")
      a.write.mode("overwrite")
        .option("path", s"$wh/ta").bucketBy(8, "id").saveAsTable("graft_ta")
      b.write.mode("overwrite")
        .option("path", s"$wh/tb").bucketBy(8, "id").saveAsTable("graft_tb")
      val j = spark.table("graft_ta").join(spark.table("graft_tb"), "id")
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join must be exchange-free, found: $shuffles")
      assert(j.count() == 5000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partitioned parquet write prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1 to 1000).map(i => (s"type${i % 5}", i, i * 1.5))
      .toDF("event_type", "id", "v")
    df.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("event_type") === "type3")
    val scan = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // Pruning happened at planning: only 1 of 5 partition dirs selected.
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1)
    assert(read.count() == 200)
  }

  test("filter and column pruning reach the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_push").toString
    (1 to 1000).map(i => (i.toLong, i * 2.0, s"s$i")).toDF("id", "v", "s")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("id") > 900).select("v")
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,900)"))
    // ReadSchema carries only the needed columns, not `s`.
    assert(scan.requiredSchema.fieldNames.toSet == Set("id", "v"))
  }

  test("broadcast hint pins the small side (no shuffle of the big side)") {
    val big = (1 to 10000).map(i => (i % 100, i)).toDF("k", "v")
    val dim = (0 until 100).map(i => (i, s"d$i")).toDF("k", "name")
    val j = big.join(broadcast(dim), "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(j.count() == 10000)
  }
}
