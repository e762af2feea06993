package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused nearest-centroid argmax: for one embedding row, the cosine
  * against EVERY centroid and the (max cos, min cid) winner in a
  * single generated loop — the codegen replacement for the
  * crossJoin(broadcast(centroids)) + struct-max aggregate, which
  * materializes N×K candidate ROWS just to throw away K−1 per
  * vector (at the 100x step that row traffic, not the flops, was
  * ~90% of the IVF assignment wall).
  *
  * Bitwise-identical to the join form by construction: the same
  * left-to-right double fold as [[DotProduct]] for the row's
  * self-dot and each centroid dot, the same
  * `cos = d > 0 ? dot/(na·nc) : 0` guard, and ties on equal cosine
  * keep the SMALLEST centroid id (the loop scans cids ascending and
  * updates only on strictly-greater cosine — exactly the
  * max-of-(cos, −cid) struct order).
  *
  * Centroids ride the expression as a literal matrix (driver-known,
  * like DistRank's bucket boundaries); [[graft.operators.Similarity]]
  * routes through this path only while K stays comfortably
  * broadcast-sized. Embedding elements must be non-null (the
  * embeddings-table contract); a centroid of mismatched width is
  * skipped, matching the join form's null-cos behavior of never
  * winning.
  */
case class CentroidArgmax(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]], norms: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType), StructField("cos", DoubleType)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "centroid_argmax"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val a = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { a(i) = arr.getFloat(i).toDouble; i += 1 }
    else while (i < n) { a(i) = arr.getDouble(i); i += 1 }
    var na2 = 0.0
    i = 0
    while (i < n) { na2 += a(i) * a(i); i += 1 }
    val na = math.sqrt(na2)
    var best = Double.NegativeInfinity
    var bc = -1L
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      if (c.length == n) {
        var acc = 0.0
        i = 0
        while (i < n) { acc += a(i) * c(i); i += 1 }
        val d = na * norms(k)
        val cos = if (d > 0.0) acc / d else 0.0
        if (cos > best) { best = cos; bc = cids(k) }
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](bc, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("caCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("caNorms", norms, "double[]")
    val cidsRef = ctx.addReferenceObj("caCids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val get =
        if (isFloat) (i: String) => s"(double) $a.getFloat($i)"
        else (i: String) => s"$a.getDouble($i)"
      val n = ctx.freshName("n")
      val vec = ctx.freshName("vec")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val na = ctx.freshName("na")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val cos = ctx.freshName("cos")
      s"""
         |int $n = $a.numElements();
         |double[] $vec = new double[$n];
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $vec[$i] = ${get(i)};
         |  $na += $vec[$i] * $vec[$i];
         |}
         |$na = java.lang.Math.sqrt($na);
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |long $bc = -1L;
         |for (int $k = 0; $k < $centsRef.length; $k++) {
         |  double[] $c = $centsRef[$k];
         |  if ($c.length != $n) continue;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) $acc += $vec[$i] * $c[$i];
         |  double $d = $na * $normsRef[$k];
         |  double $cos = $d > 0.0 ? $acc / $d : 0.0;
         |  if ($cos > $best) { $best = $cos; $bc = $cidsRef[$k]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $bc, $best });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmax =
    copy(child = newChild)
}

object CentroidArgmax {
  /** Left-fold self-norm matching [[DotProduct]]'s accumulation. */
  def foldNorm(c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  def argmax(emb: Column, cids: Array[Long],
      cents: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(CentroidArgmax(ColumnBridge.expression(emb),
      cids, cents, cents.map(foldNorm)))
  }
}
