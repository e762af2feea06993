package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Graph
import Q._

/** Link-analysis queries over the TPC-H-shaped tables (net-new vs the
  * reference, SURVEY §2 extensions): supplier/customer authority via
  * exact-integer PageRank. The reference has no graph operators; a
  * training-data pipeline uses this shape for domain-authority
  * weighting of crawled sources (rank the link graph, weight docs by
  * their domain's score).
  *
  * Determinism: the whole computation is BIGINT lattice arithmetic
  * (operators/Graph.pageRank) — no float recursion, no summation-order
  * sensitivity; the oracle unrolls the same five exact iterations.
  */
object GraphQ {

  private val SuppOffset = 1000000000L

  val queries: Map[String, QueryFn] = Map(
    // Customer↔supplier bipartite graph from who-bought-from-whom:
    // symmetric edges (undirected authority), supplier ids offset to a
    // disjoint node range, 5 exact fixed-point iterations.
    "g_pagerank" -> ((s, dir) => {
      val pairs = lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("cust"),
          (col("l_suppkey") + SuppOffset).cast("long").as("supp"))
        .distinct()
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .union(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      Graph.pageRank(edges, iters = 5)
    }))

  // Oracle: the identical exact-integer recursion, unrolled (standard
  // SQL forbids aggregating over a recursive CTE reference, and the
  // iteration count is fixed anyway). DuckDB's sum(BIGINT) widens to
  // HUGEINT — cast back before the damping multiply, per the overflow
  // contract in Graph.pageRank's scaladoc.
  private def prIter(i: Int): String =
    s"""r$i AS (SELECT n.node, 150000 + (85 * COALESCE(inc.s, 0)) // 100 AS r
       | FROM nodes n LEFT JOIN (
       |  SELECT e.dst AS node, CAST(sum(p.r // deg.deg) AS BIGINT) AS s
       |  FROM e JOIN deg ON e.src = deg.src JOIN r${i - 1} p ON p.node = e.src
       |  GROUP BY e.dst) inc ON n.node = inc.node)""".stripMargin

  val oracle: Map[String, String] = Map(
    "g_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey::BIGINT AS cust,
         |    (l_suppkey + $SuppOffset)::BIGINT AS supp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT cust AS src, supp AS dst FROM pairs
         |      UNION ALL SELECT supp, cust FROM pairs),
         |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes),
         |${(1 to 5).map(prIter).mkString(",\n")}
         |SELECT node, r FROM r5""".stripMargin)
}
