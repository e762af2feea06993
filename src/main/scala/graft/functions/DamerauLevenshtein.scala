package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd UNRESTRICTED Damerau-Levenshtein distance — edit
  * distance whose transposition op can act on characters already
  * separated by other edits (the Lowrance-Wagner algorithm), unlike
  * the more common optimal-string-alignment restriction. Spark ships
  * `levenshtein` only; transposition-aware distance is the standard
  * typo metric for entity resolution (a swapped character pair is ONE
  * keystroke error, not two).
  *
  * Semantics probe-pinned to DuckDB's `damerau_levenshtein` (the
  * oracle): dl("ca","abc") = 2 (the canonical full-DL-vs-OSA case —
  * OSA would say 3), dl("a cat","an act") = 2, empty-side = other
  * side's length. Integer-valued, so no float portability question
  * exists.
  *
  * A native `BinaryExpression` with `doGenCode` delegating to the
  * static kernel (the JaroWinkler pattern): one O(|a|·|b|) DP over
  * the full (|a|+2)×(|b|+2) matrix — full Lowrance-Wagner DL cannot
  * use a rolling-row layout because the transposition term reads
  * back to row d(i1) for an arbitrary earlier i1 — plus a
  * last-occurrence index (int[128] for ASCII, boxed-map fallback
  * beyond). Operates on UTF-16 code units of the decoded string —
  * for ASCII name columns that is DuckDB's per-character view.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ca, cb) =>
      s"""
         |${ev.value} = graft.functions.DamerauLevenshtein.distance(
         |  $ca.toString(), $cb.toString());
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance-Wagner full DL distance; static kernel shared by
    * interpreted eval and generated code. */
  def distance(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // (la+2) x (lb+2) DP with the extra INF border row/col
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // last row in which each character of the alphabet appeared in a:
    // flat int[128] for the ASCII hot path (name/text columns), boxed
    // map only for code units beyond it — avoids a HashMap allocation
    // + per-row boxing on the common case
    val daAscii = new Array[Int](128)
    var daWide: java.util.HashMap[Character, Integer] = null
    def daGet(ch: Char): Int =
      if (ch < 128) daAscii(ch)
      else if (daWide == null) 0
      else { val v = daWide.get(ch); if (v == null) 0 else v.intValue() }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1: Int = daGet(b.charAt(j - 1))
        val j1 = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
          else 1
        var best = d(i)(j) + cost // substitute / match
        val ins = d(i + 1)(j) + 1
        if (ins < best) best = ins
        val del = d(i)(j + 1) + 1
        if (del < best) best = del
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      val ai = a.charAt(i - 1)
      if (ai < 128) daAscii(ai) = i
      else {
        if (daWide == null) daWide = new java.util.HashMap[Character, Integer]()
        daWide.put(ai, i)
      }
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  def damerauLevenshtein(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
