package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (100 TB toolbox): salting spreads a hot
  * key across `factor` synthetic sub-keys so one executor doesn't
  * receive an entire pathological key's rows.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * explicit salting is the plan-level tool when the skew is known
  * (e.g. the null/default key, a mega-user) or the join is broadcast-
  * ineligible. Semantics: identical to the plain equi-join.
  */
object Skew {

  /** Equi-join `large` with `small` on `keys`, salting the large side.
    * The large side gets a deterministic salt in [0, factor) per row;
    * the small side is replicated `factor` times (explode) so every
    * (key, salt) bucket finds its match. Result == plain inner/left
    * join on `keys`.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // Replicating the small side is only sound when unmatched SMALL
    // rows never surface: right/full/semi/anti would emit one row per
    // replica.
    require(Set("inner", "left", "leftouter")(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    // Per-row round-robin salt from monotonically_increasing_id
    // (= partition_id << 33 + per-partition counter): spreads even
    // byte-identical duplicate rows of a hot key, which a hash of the
    // row's columns would send to one bucket — the degenerate-skew
    // case salting exists for. The join OUTPUT is salt-invariant by
    // construction (every salt value matches the same replicated
    // small-side rows), and Spark marks the stage INDETERMINATE so a
    // map-stage retry reruns all reducers rather than mixing old and
    // new salt assignments.
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
