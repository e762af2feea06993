package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.DoubleType

/** Guards ORACLE_NOTES rule 4: no IEEE negative zero may reach a
  * hash-compared double column. −0.0 is `==`-equal to +0.0, so a
  * value comparison can't see it, but the driver's hash can — Spark's
  * BigDecimal-backed `round` emits +0.0 where DuckDB's libm-style
  * `round` emits −0.0, and that sign bit alone kept `e1_features`
  * red for rounds 2-4 (28 `jerk_s` rows at sf0.01 whose second
  * difference crosses zero with ~1e-16 FP error).
  */
class NegZeroSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def negZeros(row: Row, idxs: Seq[Int]): Seq[Int] =
    idxs.filter { i =>
      !row.isNullAt(i) && {
        val bits = java.lang.Double.doubleToRawLongBits(row.getDouble(i))
        bits == java.lang.Double.doubleToRawLongBits(-0.0)
      }
    }

  test("e1_features doubles carry no negative zero") {
    val df = SparkEntry.queries("e1_features")(spark, dir)
    val dIdx = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == DoubleType => i
    }.toSeq
    val offenders = df.collect().flatMap(r => negZeros(r, dIdx))
      .groupBy(identity).map { case (i, v) => (df.schema(i).name, v.length) }
    assert(offenders.isEmpty, s"negative zeros in: $offenders")
  }

  test("round-then-normalize turns a tiny negative into +0.0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the exact jerk_s shape: (s - 2*lag + lag2) with FP error below
    // the rounding scale, sign negative.
    val v = Seq(-2.220446049250313e-16).toDF("x")
      .select((round(col("x"), 6) + lit(0.0)).as("r"))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(v) == 0L, s"got bits of $v")
  }
}
