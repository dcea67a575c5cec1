package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for multilingual corpus prep —
  * normalization-form conversion (NFC/NFD/NFKC/NFKD) and accent
  * stripping (NFD → drop combining marks → NFC, the fastText/CLD
  * preprocessing step). Crawled text mixes precomposed and combining
  * encodings of the SAME grapheme ("café" has two byte encodings), so
  * fingerprint dedup, stopword matching, and language ID all need one
  * canonical form first.
  *
  * Spark has no built-in for this, and a Scala UDF would pay
  * serialization + closure dispatch per row — so it is a native
  * Catalyst expression (ladder rung (b)): `doGenCode` emits a static
  * call into [[UnicodeNormUtil]], which fast-paths pure-ASCII input
  * (the dominant crawl case) with a byte scan and returns the INPUT
  * UTF8String unchanged — zero allocation, no JNI, inside whole-stage
  * codegen. Only rows that actually contain non-ASCII pay the
  * `java.text.Normalizer` (ICU-equivalent, JDK-bundled) cost.
  */
object UnicodeNormUtil {

  private val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def formIndex(name: String): Int = {
    val i = Array("NFC", "NFD", "NFKC", "NFKD").indexOf(name.toUpperCase)
    require(i >= 0, s"unknown normalization form: $name (NFC|NFD|NFKC|NFKD)")
    i
  }

  /** ASCII bytes are fixed points of every normalization form AND of
    * accent stripping — a pure-ASCII string passes through untouched.
    */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def normalize(s: UTF8String, form: Int): UTF8String = {
    if (isAscii(s)) s
    else {
      val str = s.toString
      val f = Forms(form)
      if (Normalizer.isNormalized(str, f)) s
      else UTF8String.fromString(Normalizer.normalize(str, f))
    }
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) s
    else {
      val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        // drop combining marks (Mn/Mc/Me) — the accent carriers NFD
        // just split off their base characters
        val t = Character.getType(c)
        if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.append(c)
        i += 1
      }
      // recompose what remains so unrelated composites ("ﬁ" survives
      // NFD) come back canonical
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
    }
  }
}

/** `unicode_normalize(str, form)` — see [[UnicodeNormUtil]]. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val formIdx = UnicodeNormUtil.formIndex(form)

  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize needs a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.normalize(input.asInstanceOf[UTF8String], formIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormUtil.normalize($c, $formIdx)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `strip_accents(str)` — see [[UnicodeNormUtil]]. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_accents needs a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormUtil.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNorm {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column entry: normalize to `form` ∈ NFC|NFD|NFKC|NFKD. */
  def unicode_normalize(c: Column, form: String): Column =
    ColumnBridge.toColumn(UnicodeNormalize(ColumnBridge.toExpr(c), form))

  /** Column entry: NFD → drop combining marks → NFC. */
  def strip_accents(c: Column): Column =
    ColumnBridge.toColumn(StripAccents(ColumnBridge.toExpr(c)))
}
