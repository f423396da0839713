package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.types._

/** ClickHouse tuple arithmetic — `tuplePlus/tupleMinus/tupleMultiply/
  * tupleDivide(t1, t2)` and `tupleNegate(t)` — element-wise over two
  * same-arity tuples of numeric fields. Field types follow CH's usual
  * promotion reading in Spark terms: integer-by-integer stays the
  * wider integer (division excepted — always DOUBLE, CH's `/`), any
  * floating operand makes the field DOUBLE. Per-field scalar math on
  * an already-deserialized row; not on any scan hot path, so
  * interpreted eval (CodegenFallback) costs nothing measurable. */
case class TupleArith(left: Expression, right: Expression, op: Int)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = op match {
    case TupleArith.Plus => "tuplePlus"
    case TupleArith.Minus => "tupleMinus"
    case TupleArith.Multiply => "tupleMultiply"
    case TupleArith.Divide => "tupleDivide"
    case _ => "tupleNegate"
  }

  private def fields(e: Expression): Seq[StructField] =
    e.dataType.asInstanceOf[StructType].fields.toSeq

  /** tupleMultiplyByNumber/tupleDivideByNumber: the right operand is
    * a SCALAR broadcast across every field. */
  private def scalarRight: Boolean =
    !right.dataType.isInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (a: StructType, b: StructType) =>
        if (a.size != b.size)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs same-arity tuples, got ${a.size} and ${b.size}")
        else if ((a.fields ++ b.fields).forall(
          _.dataType.isInstanceOf[NumericType]))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs numeric tuple fields")
      case (a: StructType, b: NumericType) =>
        if (a.fields.forall(_.dataType.isInstanceOf[NumericType]))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs numeric tuple fields")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects tuples, got ${a.sql} and ${b.sql}")
    }

  private def fieldType(a: DataType, b: DataType): DataType =
    if (op == TupleArith.Divide) DoubleType
    else {
      val integral: Set[DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      if (integral(a) && integral(b)) {
        if (a == LongType || b == LongType) LongType
        else if (a == IntegerType || b == IntegerType) IntegerType
        else ShortType
      } else DoubleType
    }

  override def dataType: DataType =
    if (scalarRight) StructType(fields(left).zipWithIndex.map {
      case (a, i) =>
        StructField(s"_${i + 1}", fieldType(a.dataType, right.dataType),
          a.nullable)
    })
    else StructType(
      fields(left).zip(fields(right)).zipWithIndex.map {
        case ((a, b), i) =>
          StructField(s"_${i + 1}", fieldType(a.dataType, b.dataType),
            a.nullable || b.nullable)
      })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lr = l.asInstanceOf[InternalRow]
    val lf = fields(left)
    val rf =
      if (scalarRight) lf.map(_.copy(dataType = right.dataType))
      else fields(right)
    val rr = if (scalarRight) null else r.asInstanceOf[InternalRow]
    val out = new Array[Any](lf.size)
    var i = 0
    while (i < lf.size) {
      val a = if (lr.isNullAt(i)) null else lr.get(i, lf(i).dataType)
      val b =
        if (scalarRight) r
        else if (rr.isNullAt(i)) null else rr.get(i, rf(i).dataType)
      out(i) =
        if (a == null || b == null) null
        else fieldType(lf(i).dataType, rf(i).dataType) match {
          case DoubleType =>
            val x = toD(a); val y = toD(b)
            op match {
              case TupleArith.Plus => x + y
              case TupleArith.Minus => x - y
              case TupleArith.Multiply => x * y
              case TupleArith.Divide => x / y
              case _ => -x
            }
          case it =>
            val x = toL(a); val y = toL(b)
            val v = op match {
              case TupleArith.Plus => x + y
              case TupleArith.Minus => x - y
              case TupleArith.Multiply => x * y
              case _ => -x
            }
            it match {
              case LongType => v
              case IntegerType => v.toInt
              case _ => v.toShort
            }
        }
      i += 1
    }
    new GenericInternalRow(out)
  }

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
  }

  private def toL(v: Any): Long = v match {
    case n: Number => n.longValue()
    case d: org.apache.spark.sql.types.Decimal => d.toLong
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TupleArith =
    copy(left = newLeft, right = newRight)
}

object TupleArith {
  final val Plus = 0
  final val Minus = 1
  final val Multiply = 2
  final val Divide = 3
  final val Negate = 4
}
