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
    // Salt = hash(row columns, partition id): DETERMINISTIC under task
    // retry — a recomputed map partition has the same contents and the
    // same partition id, so rows reproduce their salts and reducers
    // that already fetched output stay consistent (a row-position
    // counter like monotonically_increasing_id would not guarantee
    // that: expression nondeterminism does not mark the stage
    // indeterminate, so a partial map retry could re-salt rows onto
    // different reducers and duplicate or drop them). The partition-id
    // component spreads byte-identical duplicates of a hot key that
    // live in different input partitions — the common 100 TB case;
    // duplicates within ONE input partition (bounded by split size)
    // still share a salt.
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col) :+ spark_partition_id(): _*),
        lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
