package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-wise scalar feature math (SURVEY.md §2.2, P2-P11). Pure
  * `Column`-returning functions — everything stays inside Catalyst /
  * whole-stage codegen; no UDFs.
  *
  * Reference semantics: `main_cuda.py:147-268`, `nn/nn-mps.py:57-62,
  * 165-242, 256-287`.
  */
object Scalars {

  /** P2: velocity decomposition. Reference angle convention: dir is in
    * degrees with 0 = +y, so vx = s*sin(rad), vy = s*cos(rad)
    * (`main_cuda.py:157-167`). */
  def velocityX(s: Column, dirDeg: Column): Column = s * sin(radians(dirDeg))
  def velocityY(s: Column, dirDeg: Column): Column = s * cos(radians(dirDeg))

  /** P3: euclidean distance and bearing to a point (e.g. ball landing
    * spot), `main_cuda.py:177-188`. */
  def dist(dx: Column, dy: Column): Column = sqrt(dx * dx + dy * dy)
  def distTo(x: Column, y: Column, tx: Column, ty: Column): Column =
    dist(tx - x, ty - y)
  def angleTo(x: Column, y: Column, tx: Column, ty: Column): Column =
    atan2(ty - y, tx - x)

  /** P3: unit direction with the reference's +1e-6 zero guard
    * (`main_cuda.py:182-184`); dot-product projections. */
  def unitX(dx: Column, dy: Column): Column = dx / (dist(dx, dy) + lit(1e-6))
  def unitY(dx: Column, dy: Column): Column = dy / (dist(dx, dy) + lit(1e-6))
  def velocityToward(vx: Column, vy: Column, ux: Column, uy: Column): Column =
    vx * ux + vy * uy

  /** P2: body/energy features (`main_cuda.py:190-196`;
    * lbs→kg variant `nn/nn-mps.py:256-262`). */
  def bmi(weightLbs: Column, heightIn: Column): Column =
    weightLbs * lit(703.0) / (heightIn * heightIn)
  def momentum(weightLbs: Column, s: Column): Column = weightLbs * s
  def kineticEnergy(weightLbs: Column, s: Column): Column =
    lit(0.5) * weightLbs * s * s

  /** P4: field-geometry distances and the clip-to-field clamp
    * (`main_cuda.py:246-250,437-438`): field is [0,120] x [0,53.3] yd. */
  val FieldX = 120.0
  val FieldY = 53.3
  /** 2D euclidean distance from field center (60, 26.65) — matches
    * `main_cuda.py:246` distance_from_center. */
  def distFromCenter(x: Column, y: Column): Column =
    sqrt(pow(x - lit(FieldX / 2), 2) + pow(y - lit(FieldY / 2), 2))
  /** 1D |y - 26.65| variant (lateral offset only). */
  def distFromCenterY(y: Column): Column = abs(y - lit(FieldY / 2))
  def distFromSideline(y: Column): Column =
    least(y, lit(FieldY) - y)
  def distFromEndzone(x: Column): Column =
    least(x, lit(FieldX) - x)
  def clampX(x: Column): Column = clip(x, lit(0.0), lit(FieldX))
  def clampY(y: Column): Column = clip(y, lit(0.0), lit(FieldY))

  /** P11: clip / winsorize (`main_cuda.py:429,777-784`). */
  def clip(c: Column, lo: Column, hi: Column): Column =
    least(greatest(c, lo), hi)
  def clipLower(c: Column, lo: Column): Column = greatest(c, lo)

  /** P5: cyclical encoding of the 10 Hz frame clock
    * (`main_cuda.py:266-268`). */
  def cycleSin(c: Column, period: Double): Column =
    sin(c * lit(2.0 * math.Pi / period))
  def cycleCos(c: Column, period: Double): Column =
    cos(c * lit(2.0 * math.Pi / period))

  /** P6: boolean one-hot from a string predicate
    * (`main_cuda.py:199-202`). */
  def oneHot(c: Column, value: String): Column =
    when(c === lit(value), lit(1)).otherwise(lit(0))

  /** P7: height "ft-in" → inches. The reference parses "6-2" → 74.0
    * (`main_cuda.py:147-153`); failure default differs per pipeline
    * (NaN in cuda, 6.0 ft in nn `nn/nn-mps.py:57-62`) so it is a
    * parameter. Composed from built-ins — no UDF. */
  def heightToInches(h: Column, defaultInches: Option[Double] = None): Column = {
    // try_element_at / try_cast: Spark 4 defaults to ANSI mode, where a
    // dash-less or garbage height would abort the job instead of
    // yielding null. Malformed heights are expected input (the
    // reference catches all parse failures, `nn/nn-mps.py:57-62`).
    val parts = split(h, "-")
    val parsed = try_element_at(parts, lit(1)).try_cast("double") * lit(12.0) +
      try_element_at(parts, lit(2)).try_cast("double")
    defaultInches.map(d => coalesce(parsed, lit(d))).getOrElse(parsed)
  }

  /** P10: wrap an angle delta into (-180, 180]
    * (`nn/nn-mps.py:216-219`). */
  def angleWrap(c: Column): Column =
    when(abs(c) >= lit(180.0), c - lit(360.0) * signum(c)).otherwise(c)

  /** P8: +-Inf → null, the reference's `replace([inf,-inf], nan)`
    * (`main_cuda.py:1441`). Pair with `na.fill(0.0)` for the fillna
    * step, or group-mean imputation via a window avg + coalesce. */
  def infToNull(c: Column): Column =
    when(c === lit(Double.PositiveInfinity) ||
         c === lit(Double.NegativeInfinity) || isnan(c), lit(null))
      .otherwise(c)
}
