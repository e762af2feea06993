package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType embedding columns
  * (`embeddings.embedding: array<float>`). All arithmetic is promoted
  * to double and accumulated left-to-right so results are reproducible
  * and match the DuckDB oracle. Codegen'd higher-order functions — no
  * UDFs, no driver-side collect.
  */
object Vectors {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-to-right dot product in double precision — the
    * codegen'd DotProduct expression (bitwise-identical fold to the
    * composable zip_with+aggregate form, minus the interpreted lambda
    * per element). */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** The composable higher-order-function form (kept as the
    * cross-check for DotProduct in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for a zero vector rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > lit(0.0), dot(a, b) / d).otherwise(lit(0.0))
  }

  /** [[cosine]] with PRECOMPUTED norms — bitwise-identical result
    * (same `norm(a) * norm(b)` product, same guard, same division)
    * but the self-dots are evaluated once per VECTOR instead of once
    * per candidate pair: in an N×K assignment or a blocked pair join
    * the dot products are the dominant flops, and this cuts them 3x.
    * Callers must pass `na`/`nb` computed by [[norm]] on the same
    * columns. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = na * nb
    when(d > lit(0.0), dot(a, b) / d).otherwise(lit(0.0))
  }

  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val dd = x.cast("double") - y.cast("double")
        dd * dd
      }),
      lit(0.0), (acc, x) => acc + x))
}
