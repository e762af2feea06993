package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only mirror of the driver's t1 smoke: a PLAIN default session
  * (ANSI mode on, no legacy confs — exactly what the driver builds)
  * running SparkEntry.entry and checking rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"ENTRY ROWS: $n  (ansi=${spark.conf.get("spark.sql.ansi.enabled")})")
    spark.stop()
  }
}
