package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomKeyFilter

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain: no false negatives, nulls propagate") {
    val keys = (0L until 1000L by 2).toDF("k")
    val bytes = BloomKeyFilter.build(keys, "k", expectedItems = 1000)
    val probed = (0L until 1000L).toDF("k")
      .withColumn("hit", BloomKeyFilter.mightContain(col("k"), bytes))
    // Every inserted key MUST hit (bloom guarantee); odd keys may
    // false-positive but at 1% fpp not all of them can.
    assert(probed.filter(col("k") % 2 === 0 && !col("hit")).isEmpty)
    assert(probed.filter(col("k") % 2 === 1 && !col("hit")).count() > 400)
    val n = spark.range(1).select(
      BloomKeyFilter.mightContain(lit(null).cast("long"), bytes).as("h"))
    assert(n.collect().head.isNullAt(0))
  }

  test("bloom pre-filter + exact join == plain join") {
    val big = (0L until 5000L).map(i => (i % 700, i)).toDF("key", "payload")
    val small = Seq(3L, 14L, 159L, 265L, 358L).toDF("key")
    val bytes = BloomKeyFilter.build(small, "key", expectedItems = 100)
    val pre = big.filter(BloomKeyFilter.mightContain(col("key"), bytes))
      .join(small, "key")
    val plain = big.join(small, "key")
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
  }
}
