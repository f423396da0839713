package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** ClickHouse integer arithmetic is UNCHECKED: `plus`/`minus`/
  * `multiply`/`negate`/`abs`/`sum` (and the `*`/`+`/`-` operators)
  * wrap on 64-bit overflow (two's-complement), they never throw
  * (reference surface: any CH SELECT through
  * mcp_clickhouse/mcp_server.py:433 run_select_query; CH documents
  * integer arithmetic as modular). Spark 4 defaults to ANSI mode,
  * where the same expressions raise ARITHMETIC_OVERFLOW — a pasted
  * Knuth-hash idiom like `multiply(key, 2654435761)` that is a
  * standard CH sharding pattern dies at production key magnitudes
  * while passing every small-SF gate.
  *
  * This optimizer rule flips INTEGRAL-typed arithmetic from ANSI to
  * LEGACY eval mode (plain JVM two's-complement wrap, still
  * whole-stage-codegen'd — LEGACY codegen is a bare `a * b`), scoped
  * so everything else keeps ANSI semantics:
  *   - float/double arithmetic: unchanged (no overflow concept);
  *   - decimal arithmetic: stays ANSI (CH Decimal ops DO throw on
  *     overflow, matching);
  *   - casts: stay ANSI (CH toInt*(string) throws on garbage);
  *   - divide/modulo by zero: stays an error (CH throws too; the
  *     dialect's `divide()` is shimmed to Float64 ±inf separately).
  *
  * Sign nuance (documented departure): CH infers UInt64 for unsigned
  * inputs, so a wrapped product prints as a large positive; graft
  * carries Int64, so the SAME 64-bit pattern prints negative past
  * 2^63. Bit-level results (hashing, modulo-by-power-of-two via
  * `pmod`, bitAnd masks) agree; only the decimal rendering of values
  * past 2^63 differs.
  *
  * Installed three ways, all idempotent:
  *   - `QueryGuard.plan` rewrites the ANALYZED plan of every served /
  *     dialect-pack query before any optimizer batch, so even
  *     all-literal subtrees constant-fold with wrap semantics (this
  *     closed the round-10 "literal-only hole": ConstantFolding /
  *     ConvertToLocalRelation run in batches ahead of
  *     extraOptimizations and used to evaluate literal arithmetic
  *     ANSI-throwing);
  *   - `injectPostHocResolutionRule` (GraftExtensions) does the same
  *     at analysis time for every query on an extensions-built
  *     session, pasted or API-built;
  *   - `spark.experimental.extraOptimizations` (CHFunctions.register)
  *     + `injectOptimizerRule` (GraftExtensions) as the optimizer-time
  *     backstop for plans that reach the optimizer without
  *     re-analysis.
  * Remaining hole, documented: a `register()`-only session (no
  * extensions, query NOT through QueryGuard) still folds all-literal
  * integral overflow ANSI-throwing; every served path is covered.
  */
object WrapArith extends Rule[LogicalPlan] {

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case a @ Add(l, r, ctx)
          if ctx.evalMode == EvalMode.ANSI && a.resolved && integral(a.dataType) =>
        Add(l, r, ctx.copy(evalMode = EvalMode.LEGACY))
      case s @ Subtract(l, r, ctx)
          if ctx.evalMode == EvalMode.ANSI && s.resolved && integral(s.dataType) =>
        Subtract(l, r, ctx.copy(evalMode = EvalMode.LEGACY))
      case m @ Multiply(l, r, ctx)
          if ctx.evalMode == EvalMode.ANSI && m.resolved && integral(m.dataType) =>
        Multiply(l, r, ctx.copy(evalMode = EvalMode.LEGACY))
      case u @ UnaryMinus(c, true) if u.resolved && integral(u.dataType) =>
        UnaryMinus(c, failOnError = false)
      case ab @ Abs(c, true) if ab.resolved && integral(ab.dataType) =>
        Abs(c, failOnError = false)
      // CH sum over Int64 wraps too (the accumulator is the same
      // unchecked Int64); scoped to integral children so decimal
      // sums keep ANSI's checked behavior
      case s @ Sum(c, ctx)
          if ctx.evalMode == EvalMode.ANSI && s.resolved && integral(c.dataType) =>
        Sum(c, ctx.copy(evalMode = EvalMode.LEGACY))
      // CH's `/` is IEEE Float64 division: x/0 → ±inf, 0/0 → NaN —
      // where ANSI throws DIVIDE_BY_ZERO even for doubles. Scoped to
      // DOUBLE-typed division (decimal division keeps ANSI's throw,
      // matching CH Decimal; integer `div`/modulo keep the error CH
      // raises too). Mirrors the registered divide() shim so the bare
      // operator and the named function agree.
      case d @ Divide(l, r, ctx)
          if ctx.evalMode == EvalMode.ANSI && d.resolved &&
            d.dataType == org.apache.spark.sql.types.DoubleType =>
        IeeeDivide(l, r)
    }
}

/** Plain JVM IEEE-754 Float64 division: x/±0.0 → ±inf honoring BOTH
  * signs (1 / -0.0 = -inf), 0.0/0.0 → NaN, null-propagating,
  * single-evaluation, one `/` inside whole-stage codegen. Replaces the
  * former CaseWhen rewrite, which duplicated both operands across
  * branches (a scalar-subquery or non-deterministic operand evaluated
  * up to 3 extra times and could classify the zero-divisor sign
  * inconsistently) and consulted only the NUMERATOR's sign — +inf for
  * x / -0.0 where IEEE and ClickHouse give -inf (ADVICE r11). */
case class IeeeDivide(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.DoubleType
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "divide"
  override def nullSafeEval(l: Any, r: Any): Any =
    l.asInstanceOf[Double] / r.asInstanceOf[Double]
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"($a / $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IeeeDivide =
    copy(left = newLeft, right = newRight)
}

/** ClickHouse `gcd(a, b)` — Euclid over Int64 (Spark has no builtin).
  * gcd(x, 0) = |x|; nulls propagate. One static JVM loop in
  * whole-stage codegen. */
case class LongGcd(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"
  override def nullSafeEval(l: Any, r: Any): Any =
    LongGcd.compute(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LongGcd.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongGcd =
    copy(left = newLeft, right = newRight)
}

object LongGcd {
  def compute(a: Long, b: Long): Long = {
    var x = math.abs(a)
    var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
}

/** ClickHouse `lcm(a, b)` — |a / gcd * b|; lcm(x, 0) = 0. */
case class LongLcm(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"
  override def nullSafeEval(l: Any, r: Any): Any =
    LongLcm.compute(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LongLcm.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongLcm =
    copy(left = newLeft, right = newRight)
}

object LongLcm {
  def compute(a: Long, b: Long): Long = {
    val g = LongGcd.compute(a, b)
    if (g == 0) 0L else math.abs(a / g * b)
  }
}
