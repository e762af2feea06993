package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DamerauLevenshtein, DotProduct, EwmAvg, JaroWinkler, LongArrayIntersectCount, NgramJaccard, NgramPolyHash}

/** Spark extension entry point: registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get them without
  * touching the Scala API.
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  *   SELECT dot_product(a.embedding, b.embedding) ...
  *   SELECT ngram_poly_hash(t, 3) ...
  *   SELECT ewm_avg(v, 0.3) OVER (PARTITION BY k ORDER BY t
  *          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
  private def litDouble(e: Expression, name: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name must be a numeric literal, got $other")
  }

  private def arity(name: String, children: Seq[Expression],
                    lo: Int, hi: Int): Unit =
    if (children.length < lo || children.length > hi)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> (if (lo == hi) s"$lo" else s"$lo to $hi"),
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        arity("dot_product", children, 2, 2)
        DotProduct(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("ngram_poly_hash"),
      new ExpressionInfo(classOf[NgramPolyHash].getName, "ngram_poly_hash"),
      (children: Seq[Expression]) => {
        arity("ngram_poly_hash", children, 2, 3)
        NgramPolyHash(
          children(0), litInt(children(1), "n"),
          if (children.length > 2) litInt(children(2), "mult").toLong else 31L)
      }))

    ext.injectFunction((
      FunctionIdentifier("ngram_jaccard"),
      new ExpressionInfo(classOf[NgramJaccard].getName, "ngram_jaccard"),
      (children: Seq[Expression]) => {
        arity("ngram_jaccard", children, 2, 3)
        NgramJaccard(children(0), children(1),
          if (children.length > 2) litInt(children(2), "n") else 3)
      }))

    ext.injectFunction((
      FunctionIdentifier("array_intersect_count"),
      new ExpressionInfo(classOf[LongArrayIntersectCount].getName,
        "array_intersect_count"),
      (children: Seq[Expression]) => {
        arity("array_intersect_count", children, 2, 2)
        LongArrayIntersectCount(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("ewm_avg"),
      new ExpressionInfo(classOf[EwmAvg].getName, "ewm_avg"),
      (children: Seq[Expression]) => {
        arity("ewm_avg", children, 2, 2)
        EwmAvg(children(0), litDouble(children(1), "alpha"))
      }))

    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        arity("jaro_winkler", children, 2, 2)
        JaroWinkler(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (children: Seq[Expression]) => {
        arity("damerau_levenshtein", children, 2, 2)
        DamerauLevenshtein(children(0), children(1))
      }))
  }
}
