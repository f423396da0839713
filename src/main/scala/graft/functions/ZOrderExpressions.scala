package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaving for Z-ORDER data layout (SURVEY §2 C7): children
  * are range-scaled non-negative ints (≤ 32 / ≤ 21 bits for arity
  * 2 / 3) and the result is their Morton code — sorting by it clusters
  * rows that are close in EVERY dimension into the same parquet row
  * groups, so min/max skipping prunes multi-column predicates the way
  * a single-column sort only can for its leading column.
  */
case class ZInterleave2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZInterleave.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZInterleave2 = copy(left = l, right = r)
}

case class ZInterleave3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZInterleave.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.ZInterleave.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZInterleave3 =
    copy(first = f, second = s, third = t)
}

object ZInterleave {

  /** Morton code of two 32-bit values (bit i of a → bit 2i, of b →
    * bit 2i+1). */
  def interleave2(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Morton code of three 21-bit values. */
  def interleave3(a: Long, b: Long, c: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((a >>> i) & 1L) << (3 * i)
      z |= ((b >>> i) & 1L) << (3 * i + 1)
      z |= ((c >>> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }
}
