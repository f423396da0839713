package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ClickHouse `pointInPolygon((x, y), [(x1, y1), ...])` — standard
  * even-odd ray casting over the vertex ring (the public algorithm;
  * CH documents the same winding-free test). The point is a 2-field
  * struct (Spark's row constructor `(x, y)` and CH's `tuple(x, y)`
  * both produce one), the polygon an array of 2-field structs. Hole
  * rings (CH's extra array arguments) are rejected loudly. Boundary
  * points follow the ray-cast convention (edges on one side count),
  * matching CH's implementation-defined edge contract. */
case class PointInPolygon(point: Expression, polygon: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = point
  override def right: Expression = polygon
  override def dataType: DataType = BooleanType
  override def prettyName: String = "pointInPolygon"

  private def num2(t: DataType): Boolean = t match {
    case s: StructType =>
      s.fields.length == 2 && s.fields.forall(_.dataType.isInstanceOf[NumericType])
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (point.dataType, polygon.dataType) match {
      case (p, ArrayType(e, _)) if num2(p) && num2(e) =>
        TypeCheckResult.TypeCheckSuccess
      case (p, q) => TypeCheckResult.TypeCheckFailure(
        s"pointInPolygon expects ((x, y), [(x, y), ...]), got " +
          s"(${p.simpleString}, ${q.simpleString})")
    }

  private def coord(row: InternalRow, st: StructType, i: Int): Double =
    row.get(i, st(i).dataType) match {
      case n: Number => n.doubleValue()
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"pointInPolygon: numeric coordinate expected, got $other")
    }

  override def nullSafeEval(pv: Any, polyv: Any): Any = {
    val pt = point.dataType.asInstanceOf[StructType]
    val prow = pv.asInstanceOf[InternalRow]
    val px = coord(prow, pt, 0)
    val py = coord(prow, pt, 1)
    val et = polygon.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val arr = polyv.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val vi = arr.getStruct(i, 2)
      val vj = arr.getStruct(j, 2)
      if (vi != null && vj != null) {
        val xi = coord(vi, et, 0); val yi = coord(vi, et, 1)
        val xj = coord(vj, et, 0); val yj = coord(vj, et, 1)
        if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi)
          inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(point = newLeft, polygon = newRight)
}
