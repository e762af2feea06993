package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Folds, Scaler}
import Q._

/** Registered queries for the ML-support operators that are exactly
  * SQL-expressible: fold assignment (M1) and standard scaling (M6).
  * Model-training queries (M2/M3/M5) register in [[PipelineQ]] as
  * rows-only checks — GBT fits aren't SQL. */
object MlQ {

  val queries: Map[String, QueryFn] = Map(
    "m1_folds" -> ((s, dir) => {
      Folds.withRankFold(customer(s, dir), Seq("c_nationkey", "c_mktsegment"), 5)
        .select(col("c_custkey"), col("fold").cast("long").as("fold"))
    }),

    "m6_scaler" -> ((s, dir) => {
      Scaler.fitTransform(lineitem(s, dir), Seq("l_quantity", "l_extendedprice"))
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          r6(col("l_quantity_scaled")).as("q_scaled"),
          r6(col("l_extendedprice_scaled")).as("p_scaled"))
    }))

  val oracle: Map[String, String] = Map(
    "m1_folds" ->
      """WITH keys AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer),
        |f AS (SELECT c_nationkey, c_mktsegment,
        |  (dense_rank() OVER (ORDER BY c_nationkey, c_mktsegment) - 1) % 5 AS fold
        | FROM keys)
        |SELECT c_custkey, CAST(fold AS BIGINT) AS fold
        |FROM customer JOIN f USING (c_nationkey, c_mktsegment)""".stripMargin,

    "m6_scaler" ->
      """WITH stats AS (SELECT avg(l_quantity) AS mq, stddev_samp(l_quantity) AS sq,
        |  avg(l_extendedprice) AS mp, stddev_samp(l_extendedprice) AS sp FROM lineitem)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | round((l_quantity - mq) / sq, 6) AS q_scaled,
        | round((l_extendedprice - mp) / sp, 6) AS p_scaled
        |FROM lineitem, stats""".stripMargin)
}
