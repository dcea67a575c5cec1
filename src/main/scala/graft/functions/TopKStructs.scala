package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate over struct rows (SURVEY.md §2.10's
  * planned `TypedImperativeAggregate`): keeps the k extreme structs by
  * the struct's lexicographic order, map-side combined.
  *
  * Why it matters at 100 TB: the rank-window formulation of per-group
  * top-k ships EVERY row through the shuffle and sorts whole
  * partitions; this aggregate's partial buffers cap at k rows per group
  * per input partition, so shuffle volume is bounded by
  * groups × k × partitions regardless of input size — the same shape
  * win as a11's argmax, generalized from k = 1 to any k.
  *
  * Ordering: `descending = false` keeps the k SMALLEST (matches
  * `row_number() over (order by s asc) <= k`), `true` the k largest.
  * The returned array is sorted in that same direction, so
  * `posexplode` positions + 1 reproduce the ranks. Lead the struct
  * with the sort keys and append a unique tiebreaker for fully
  * deterministic results.
  */
case class TopKStructs(child: Expression, k: Int, descending: Boolean,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(k >= 1, s"k must be positive, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val baseOrd =
    TypeUtils.getInterpretedOrdering(child.dataType)
  private lazy val ord: Ordering[InternalRow] =
    (if (descending) baseOrd.reverse else baseOrd)
      .asInstanceOf[Ordering[InternalRow]]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_structs needs an orderable struct input, got $t")
    }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty[InternalRow]

  // amortized bound: let the buffer grow to 2k, then sort+truncate —
  // O(n log k) total, buffer memory capped at 2k rows
  private def trim(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length > 2 * k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear(); buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[InternalRow].copy()
    trim(buf)
  }

  override def merge(buf: ArrayBuffer[InternalRow],
                     other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.sorted(ord).take(k).toArray[Any])

  private lazy val proj = UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(buf.length)
    buf.foreach { row =>
      val u = proj(InternalRow(row))
      d.writeInt(u.getSizeInBytes)
      u.writeToStream(d, null)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val u = new UnsafeRow(1)
      u.pointTo(rowBytes, len)
      buf += u.getStruct(0, structType.length).copy()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStructs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_structs"
}

object TopKStructs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `top_k_structs(struct(...), k, descending)`. */
  def top_k_structs(structCol: Column, k: Int, descending: Boolean = false): Column =
    ColumnBridge.toColumn(
      TopKStructs(ColumnBridge.toExpr(structCol), k, descending)
        .toAggregateExpression())
}
