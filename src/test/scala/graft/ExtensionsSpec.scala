package graft

/** The SQL surface of the custom expressions, registered through
  * SparkSessionExtensions (spark.sql.extensions=graft.GraftExtensions). */
class ExtensionsSpec extends SparkSpec {

  test("dot_product available in SQL") {
    val r = spark.sql(
      "SELECT dot_product(array(3.0D, 4.0D), array(4.0D, 3.0D)) AS d").head()
    assert(r.getDouble(0) == 24.0)
  }

  test("ngram_poly_hash available in SQL") {
    val r = spark.sql("SELECT ngram_poly_hash('abc', 3) AS g").head()
    val h = ((('a'.toLong * 31 + 'b') % graft.functions.Text.P) * 31 + 'c') %
      graft.functions.Text.P
    assert(r.getSeq[Long](0) == Seq(h))
  }

  test("ngram_jaccard available in SQL") {
    val r = spark.sql(
      "SELECT ngram_jaccard('abcd', 'abcd') AS same, " +
        "ngram_jaccard('abcd', 'wxyz') AS disj, " +
        "ngram_jaccard('abcde', 'bcdef', 4) AS n4").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    assert(approx(r.getDouble(2), 1.0 / 3.0)) // {abcd,bcde} vs {bcde,cdef}
  }

  test("array_intersect_count available in SQL") {
    val r = spark.sql(
      "SELECT array_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS c")
      .head()
    assert(r.getLong(0) == 2L)
  }

  test("ewm_avg usable as a SQL window function") {
    spark.sql("""SELECT * FROM VALUES ('a', 1, 10.0), ('a', 2, 20.0), ('a', 3, 30.0)
      AS t(k, ts, v)""").createOrReplaceTempView("ewm_in")
    val r = spark.sql(
      """SELECT ewm_avg(v, 0.5) OVER (PARTITION BY k ORDER BY ts
        | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ewm_in ORDER BY ts""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(approx(r(0), 10.0) && approx(r(1), 15.0) && approx(r(2), 22.5))
  }
}
