package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ml.Stacking
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic small data: y = 3 + 2*a - b + noise-ish pattern
    val rows = (1 to 40).map { i =>
      val a = i * 0.7 % 13; val b = (i * 3 % 7).toDouble
      (a, b, 3.0 + 2.0 * a - b + math.sin(i) * 0.5)
    }
    val df = rows.toDF("c0", "c1", "y")
    val m = Stacking.train(df, Seq("c0", "c1"), "y", alpha = 1.0)
    println(s"COEF ${m.m.coefficients.toArray.mkString(",")} INTERCEPT ${m.m.intercept}")
    spark.stop()
  }
}
