package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Trigram statistics over a token array as ONE native pass:
  * `struct(n_trigrams, n_distinct)` from a single loop with a hash set.
  *
  * The portable formulation (`transform(sequence(...), slice...)` +
  * `array_distinct`) runs as an interpreted higher-order-function tree —
  * measured ~2 ms/row, and being non-codegen it is re-evaluated per
  * referencing column with no subexpression elimination. This expression
  * participates in whole-stage codegen, so CSE evaluates it once per row
  * and the repetition score stays a narrow scan-speed operator
  * (SURVEY §2 D19). Semantics match the DuckDB oracle's list form
  * exactly: trigrams are space-joined token windows.
  */
case class TrigramStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TrigramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramStats =
    copy(child = newChild)
}

object TrigramStats {

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n < 3) return new GenericInternalRow(Array[Any](0L, 0L))
    val tokens = new Array[String](n)
    var i = 0
    while (i < n) { tokens(i) = toks.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.HashSet[String](math.max(4, (n - 2) * 2))
    i = 0
    while (i < n - 2) {
      seen.add(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any]((n - 2).toLong, seen.size.toLong))
  }
}
