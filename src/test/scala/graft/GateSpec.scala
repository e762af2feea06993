package graft

/** Round-10 gate queries: each turns a previously spec-only MLlib
  * contract into a driver-visible oracled row. This spec runs the
  * registered queries themselves (not a reimplementation) on the
  * smallest testdata so a gate that silently flips to 0 fails CI
  * before the driver sweep sees it.
  */
class GateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def flags(name: String): Map[String, Long] = {
    val row = SparkEntry.queries(name)(spark, dir).collect().head
    row.schema.fieldNames.map(f => f -> row.getAs[Long](f)).toMap
  }

  test("m2_rmse_gate: the primary GBT pair beats physics on its held-out fold") {
    val f = flags("m2_rmse_gate")
    assert(f("m2_beats_physics") == 1L, f)
    assert(f("physics_rmse_positive") == 1L, f)
  }

  test("s5_roundtrip_gate: save/load/predict is bit-exact on every row") {
    val f = flags("s5_roundtrip_gate")
    assert(f("roundtrip_exact") == 1L, f)
    assert(f("n_rows_positive") == 1L, f)
  }

  test("m25_isotonic_gate: MLlib PAV agrees with the closed form at every score") {
    val f = flags("m25_isotonic_gate")
    assert(f("all_agree") == 1L, f)
    assert(f("n_scores") > 0L && f("n_agree") == f("n_scores"), f)
  }
}
