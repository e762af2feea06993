package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val d = d0.withColumn("fp", Text.polyHash(Text.normalizeAz(col("text"))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("fp"), col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    val q = d.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter((col("__rn") - 1) * 5 < col("__n") * 1)
      .select(col("doc_id"), col("lang"), col("fp"))
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val c = q.count()
      println(f"slow run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c)")
    }
    spark.stop()
  }
}
