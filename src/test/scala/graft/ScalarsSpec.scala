package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** Scalar feature semantics: angle wrap boundaries, height parse with
  * malformed input (ANSI-safe), velocity convention, field geometry,
  * clip, inf/nan sanitation. */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Option[Double] = {
    val r = spark.range(1).select(c.as("v")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("P10 angleWrap: exact +180 wraps to -180 and -180 to +180 (>= boundary)") {
    assert(one(Scalars.angleWrap(lit(180.0))).contains(-180.0))
    assert(one(Scalars.angleWrap(lit(-180.0))).contains(180.0))
    assert(one(Scalars.angleWrap(lit(179.5))).contains(179.5))
    assert(one(Scalars.angleWrap(lit(200.0))).contains(-160.0))
    assert(one(Scalars.angleWrap(lit(-350.0))).contains(10.0))
  }

  test("P7 heightToInches: parses ft-in; malformed yields null or default") {
    def parse(s: String, d: Option[Double]) =
      one(Scalars.heightToInches(lit(s), d))
    assert(parse("6-2", None).contains(74.0))
    assert(parse("5-11", None).contains(71.0))
    assert(parse("bad", None).isEmpty)
    assert(parse("bad", Some(72.0)).contains(72.0))
    assert(parse("6", None).isEmpty)         // dash-less: no ANSI abort
    assert(parse("6-x", Some(70.0)).contains(70.0))
  }

  test("P2 velocity convention: dir=0 deg is +y") {
    assert(one(Scalars.velocityX(lit(3.0), lit(0.0))).exists(v => approx(v, 0.0, 1e-12)))
    assert(one(Scalars.velocityY(lit(3.0), lit(0.0))).exists(v => approx(v, 3.0, 1e-12)))
    assert(one(Scalars.velocityX(lit(3.0), lit(90.0))).exists(v => approx(v, 3.0, 1e-12)))
  }

  test("P4 distFromCenter is the 2D euclidean distance from (60, 26.65)") {
    assert(one(Scalars.distFromCenter(lit(60.0), lit(26.65))).exists(v => approx(v, 0.0)))
    assert(one(Scalars.distFromCenter(lit(63.0), lit(30.65)))
      .exists(v => approx(v, 5.0)))
    assert(one(Scalars.distFromCenterY(lit(20.65))).exists(v => approx(v, 6.0)))
  }

  test("P4/P11 clamp to field and generic clip") {
    assert(one(Scalars.clampX(lit(-3.0))).contains(0.0))
    assert(one(Scalars.clampX(lit(125.0))).contains(120.0))
    assert(one(Scalars.clampY(lit(60.0))).contains(53.3))
    assert(one(Scalars.clip(lit(5.0), lit(0.0), lit(3.0))).contains(3.0))
    assert(one(Scalars.clipLower(lit(-2.0), lit(0.0))).contains(0.0))
  }

  test("P8 infToNull maps +-Inf and NaN to null, keeps finite") {
    assert(one(Scalars.infToNull(lit(Double.PositiveInfinity))).isEmpty)
    assert(one(Scalars.infToNull(lit(Double.NegativeInfinity))).isEmpty)
    assert(one(Scalars.infToNull(lit(Double.NaN))).isEmpty)
    assert(one(Scalars.infToNull(lit(1.5))).contains(1.5))
  }

  test("P3 unit vectors carry the 1e-6 zero guard (no NaN at zero distance)") {
    assert(one(Scalars.unitX(lit(0.0), lit(0.0))).contains(0.0))
  }
}
