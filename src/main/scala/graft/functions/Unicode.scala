package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared accent-stripping kernel: canonical-decompose (NFD), drop the
  * combining marks (Unicode category Mn), leave everything else —
  * byte-for-byte the utf8proc recipe DuckDB's `strip_accents` uses, so
  * outputs hash-compare across engines. Strings carry no float-drift
  * risk; the only portability requirement is agreeing on the mark set,
  * and NFD + Mn is the common definition.
  */
object UnicodeOps {
  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: pure ASCII never decomposes.
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(Marks.matcher(nfd).replaceAll(""))
  }
}

/** Accent removal as a native expression (corpus normalization for
  * dedup/language-ID: "café" and "cafe" must collide). Codegen emits a
  * single static call — the kernel itself is branch-light and
  * allocation-free for ASCII input, which dominates web corpora.
  *
  * Reference scope: the reference normalizes text Python-side before
  * hashing; this is the engine-native equivalent for the LLM-pipeline
  * extension (SURVEY §2 extensions, text analysis family).
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeOps.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeOps.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  def strip(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))
  }
}

/** NFC canonical composition as a native expression — the first step
  * of any dedup/hash pipeline over real-world text: visually identical
  * strings ("é" composed vs "e"+U+0301) must hash identically before
  * any exact or MinHash comparison. Same ASCII fast path as
  * [[StripAccents]]; DuckDB's `nfc_normalize` is the oracle twin
  * (both implement Unicode canonical composition, so outputs are
  * byte-identical).
  */
object NfcOps {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) return s
    UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcOps.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  }
}
