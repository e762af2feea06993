package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.graftshim.ListenerBusBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run named registered queries under the Bench session
  * settings and report how many Spark JOBS each fires end to end
  * (build-time sketches/fits + the final action). The per-query job
  * count is the honest "how many eager passes does this operator pay"
  * metric for plan shapes whose cost is driver-loop structure rather
  * than a single DAG — the final `explain` of an iterative query only
  * shows the last plan over checkpointed RDDs.
  *
  * Usage: runMain graft.tools.JobCount <sfDir> q1 q2 ...
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 128 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    })
    args.drop(1).foreach { q =>
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      ListenerBusBridge.waitUntilEmpty(spark.sparkContext)
      val before = n.get()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.toRdd.count()
      ListenerBusBridge.waitUntilEmpty(spark.sparkContext)
      println(f"JOBCOUNT $q jobs=${n.get() - before} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f rows=$rows")
    }
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    spark.stop()
  }
}
