package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays, with whole-stage
  * codegen. Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * formulation, whose higher-order lambdas run interpreted (one
  * closure dispatch per element) — measured several times slower on
  * the ANN scoring path.
  *
  * Semantics (kept bit-identical to the fold it replaces, which the
  * DuckDB oracle also mirrors): left-to-right accumulation in index
  * order, `acc + (a_i.toDouble * b_i.toDouble)`; NULL if either array
  * is NULL or lengths differ. Elements may be FLOAT, DOUBLE, or
  * TINYINT arrays (the int8 ANN path scores byte vectors without a
  * per-row array cast).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType | ByteType, _),
            ArrayType(FloatType | DoubleType | ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<float|double|tinyint> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
        case FloatType => arr.getFloat(i).toDouble
        case ByteType  => arr.getByte(i).toDouble
        case _         => arr.getDouble(i)
      }
      val (at, bt) = (elemType(left), elemType(right))
      val checkNulls = mayHaveNullElems
      var acc = 0.0
      var i = 0
      while (i < n) {
        // NULL element propagates (matches the HOF fold / DuckDB)
        if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
        acc += get(a, at, i) * get(b, bt, i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case ByteType  => "getByte"
      case _         => "getDouble"
    }
    val aGet = getter(elemType(left))
    val bGet = getter(elemType(right))
    val nullCheck = if (mayHaveNullElems)
      (a: String, b: String, i: String) =>
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
    else (_: String, _: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${nullCheck(a, b, i)}
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level entry point. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      DotProduct(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
