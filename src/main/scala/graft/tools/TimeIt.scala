package graft.tools
import org.apache.spark.sql.SparkSession
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
    }
    spark.stop()
  }
}
