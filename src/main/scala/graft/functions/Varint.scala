package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unsigned LEB128 (varint) packing for compressed posting lists — the
  * wire format real inverted indexes ship (Lucene's VInt, Kafka/
  * protobuf varints): each value is little-endian 7-bit groups, high
  * bit = continuation. Combined with d-gap deltas (doc_id_i −
  * doc_id_{i−1}), a sorted posting list compresses ~4× vs decimal
  * strings — at 100 TB the index artifact's size IS the serving tier's
  * working set, so the export format matters as much as the plan that
  * builds it.
  *
  * Cells are lowercase-hex strings (2 chars/byte) rather than BINARY
  * because the repo's oracle harness hashes strings, and DuckDB can
  * re-derive the exact hex arithmetically — every byte of the artifact
  * stays oracle-gated. A consumer decodes with [[VarintUtil.decodePostings]]
  * (or any LEB128 reader after hex→bytes).
  *
  * Both directions are native Catalyst expressions (`doGenCode` static
  * calls, the [[UnicodeNormUtil]] ladder-rung-(b) pattern) so the
  * per-posting byte loop runs inside whole-stage codegen, not an
  * interpreted HOF lambda.
  */
object VarintUtil {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Interleaved non-negative longs → LEB128 byte stream as lowercase
    * hex. Negative input is a caller bug (gaps of a sorted unique id
    * list are ≥ 1, tfs ≥ 1) and throws.
    */
  def packHex(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      var v = arr.getLong(i)
      require(v >= 0, s"varint value must be non-negative, got $v")
      var cont = true
      while (cont) {
        var b = (v & 0x7fL).toInt
        v >>>= 7
        cont = v != 0L
        if (cont) b |= 0x80
        sb.append(HexDigits(b >>> 4)).append(HexDigits(b & 0xf))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  /** Hex LEB128 stream of interleaved (gap, tf) pairs back to
    * `array<struct<doc_id,tf>>` rows, gaps prefix-summed to absolute
    * doc_ids (the first gap in a cell IS the first doc_id — blocks are
    * self-contained so a seek never needs the previous block). A
    * malformed cell (odd hex length, non-hex char, truncated varint,
    * dangling gap without tf) returns an EMPTY array — decoders in
    * this repo never throw on bad payloads (BinaryOps convention).
    */
  def decodePostings(hex: UTF8String): ArrayData = {
    val nb = hex.numBytes()
    if (nb % 2 != 0) return new GenericArrayData(Array.empty[Any])
    val vals = new scala.collection.mutable.ArrayBuffer[Long](nb / 4 + 1)
    var i = 0
    var v = 0L
    var shift = 0
    var inValue = false
    while (i + 1 < nb) {
      val hi = hexVal(hex.getByte(i))
      val lo = hexVal(hex.getByte(i + 1))
      if (hi < 0 || lo < 0) return new GenericArrayData(Array.empty[Any])
      val b = (hi << 4) | lo
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) != 0) { shift += 7; inValue = true }
      else { vals += v; v = 0L; shift = 0; inValue = false }
      i += 2
    }
    if (inValue || vals.length % 2 != 0)
      return new GenericArrayData(Array.empty[Any])
    val m = vals.length / 2
    val out = new Array[Any](m)
    var doc = 0L
    var j = 0
    while (j < m) {
      doc += vals(2 * j)
      out(j) = new GenericInternalRow(
        Array[Any](doc, vals(2 * j + 1))): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `varint_pack_hex(array<long>)` — see [[VarintUtil.packHex]]. */
case class VarintPackHex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"varint_pack_hex needs array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    VarintUtil.packHex(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VarintUtil.packHex($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `varint_postings_decode(hex)` — see [[VarintUtil.decodePostings]]. */
case class VarintPostingsDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"varint_postings_decode needs a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    VarintUtil.decodePostings(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VarintUtil.decodePostings($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Varint {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column entry: interleaved longs → LEB128 lowercase hex. */
  def varint_pack_hex(c: Column): Column =
    ColumnBridge.toColumn(VarintPackHex(ColumnBridge.toExpr(c)))

  /** Column entry: hex cell → `array<struct<doc_id,tf>>`, gaps summed. */
  def varint_postings_decode(c: Column): Column =
    ColumnBridge.toColumn(VarintPostingsDecode(ColumnBridge.toExpr(c)))
}
