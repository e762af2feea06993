package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering key — the locality-preserving alternative
  * to the Morton/Z-order key (`ZOrder.zOrder2` / o9_zorder) for
  * data-layout clustering before a sorted write: consecutive Hilbert
  * indices are always GRID-ADJACENT (|Δx|+|Δy| = 1), so a range of
  * the key covers a compact blob with no Z-shape jumps — tighter
  * per-file min/max zone maps on BOTH dimensions at 100 TB (the
  * reason Delta's liquid clustering moved from Z-order to Hilbert).
  *
  * Net-new vs the reference (SURVEY.md §2.11). Pure integer bit math
  * (the standard xy2d rotation recurrence), bitwise portable; the
  * HilbertSpec pins the bijection and the adjacency property that
  * distinguishes it from Morton.
  */
object Hilbert {

  /** Appends `out` = Hilbert index of (xCol, yCol) on the
    * 2^bits x 2^bits grid. The recurrence is unrolled ROUND BY ROUND
    * through aliased intermediate columns — each round references the
    * previous round's ATTRIBUTES, never its expression tree, so the
    * plan stays linear in `bits` (the interpreted-HOF O(len^2)
    * lesson applied to expression nesting). Inputs must already lie
    * in [0, 2^bits). */
  def withHilbert(df: DataFrame, xCol: Column, yCol: Column,
                  bits: Int, out: String): DataFrame = {
    require(bits >= 1 && bits <= 31)
    var cur = df
      .withColumn("__hx", xCol.cast("long"))
      .withColumn("__hy", yCol.cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = (col("__hx").bitwiseAND(lit(s)) > 0).cast("long")
      val ry = (col("__hy").bitwiseAND(lit(s)) > 0).cast("long")
      // quadrant = (3*rx) XOR ry, written as the explicit CASE so the
      // SQL mirror is token-identical
      val q = when(rx === 0 && ry === 0, 0L)
        .when(rx === 0, 1L).when(ry === 1, 2L).otherwise(3L)
      val xn = when(ry === 1, col("__hx"))
        .when(rx === 1, lit(s - 1) - col("__hy"))
        .otherwise(col("__hy"))
      val yn = when(ry === 1, col("__hy"))
        .when(rx === 1, lit(s - 1) - col("__hx"))
        .otherwise(col("__hx"))
      cur = cur
        .withColumn("__hd2", col("__hd") + lit(s * s) * q)
        .withColumn("__hx2", xn)
        .withColumn("__hy2", yn)
        .drop("__hx", "__hy", "__hd")
        .withColumnRenamed("__hx2", "__hx")
        .withColumnRenamed("__hy2", "__hy")
        .withColumnRenamed("__hd2", "__hd")
    }
    cur.withColumnRenamed("__hd", out).drop("__hx", "__hy")
  }

  /** The matching DuckDB SQL: an unrolled CTE chain, one round per
    * bit, mirroring [[withHilbert]] token for token.
    *
    * CONTRACT (the caller writes the base CTE and the final select):
    *  - the base CTE MUST be named `h0` and expose the `keyCols`
    *    plus `x`, `y` (the grid coords, already in [0, 2^bits)) and
    *    `d` = 0::BIGINT (the accumulator seed);
    *  - this fragment defines CTEs h1..h$bits / g1..g$bits; the
    *    FINAL CTE `g$bits` exposes `keyCols` and the Hilbert index
    *    as `d` — select from it;
    *  - `keyCols` must not collide with x/y/d, rx/ry, or the
    *    per-round names x1../y1../d1.. below.
    *
    * Every round writes its outputs under round-unique names
    * (x$r/y$r/d$r) and reads the PREVIOUS round's names, so no
    * SELECT ever aliases an output over one of its own inputs —
    * correctness cannot hinge on the engine's column-vs-lateral-
    * alias resolution order (DuckDB prefers the FROM column today,
    * but that is a precedence rule, not a contract). Coordinates
    * stay in [0, 2^i) in round i — `(s-1) - y` is applied only when
    * that round's bit is clear — so no intermediate goes negative
    * and `&` never touches a negative operand. */
  def hilbertSql(bits: Int, keyCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, rIdx) =>
      val s = 1L << i
      val r = rIdx + 1
      val prev = if (r == 1) "h0" else s"g${r - 1}"
      val (xi, yi, di) =
        if (r == 1) ("x", "y", "d")
        else (s"x${r - 1}", s"y${r - 1}", s"d${r - 1}")
      val (xo, yo, dOut) =
        if (r == bits) (s"x$bits", s"y$bits", "d")
        else (s"x$r", s"y$r", s"d$r")
      s"""h$r AS (SELECT $keys,
         |  CASE WHEN ($xi & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |  CASE WHEN ($yi & $s) > 0 THEN 1 ELSE 0 END AS ry,
         |  $xi, $yi, $di FROM $prev),
         |g$r AS (SELECT $keys,
         |  CASE WHEN ry = 1 THEN $xi
         |       WHEN rx = 1 THEN ${s - 1} - $yi ELSE $yi END AS $xo,
         |  CASE WHEN ry = 1 THEN $yi
         |       WHEN rx = 1 THEN ${s - 1} - $xi ELSE $xi END AS $yo,
         |  $di + ${s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
         |    WHEN rx = 0 THEN 1 WHEN ry = 1 THEN 2 ELSE 3 END) AS $dOut
         | FROM h$r)""".stripMargin
    }.mkString(",\n")
  }
}
