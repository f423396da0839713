package graft.functions

import org.apache.spark.sql.catalyst.analysis.{TypeCheckResult, UnresolvedFunction, UnresolvedHaving}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.types._

/** ClickHouse numeric truthiness: any non-zero numeric is true in a
  * boolean context (`WHERE x % 2`, `if(position(s, 'x'), ...)`,
  * `WHERE changed` on a UInt8 flag column) — Spark demands BOOLEAN and
  * dies with FILTER_NOT_BOOLEAN / DATATYPE_MISMATCH. [[Truthy]] is the
  * bridge: a boolean child passes through untouched, a numeric child
  * becomes `child != 0`. RuntimeReplaceable, so after analysis the
  * optimizer's ReplaceExpressions swaps in the plain comparison — the
  * executed plan carries an ordinary codegen'd, pushdown-eligible
  * `NOT (x = 0)`, never a custom eval.
  *
  * Reference: mcp_server.py:433-459 accepts arbitrary pasted ClickHouse
  * SELECTs, where flag predicates (`WHERE changed`, CDC `sign`,
  * `WHERE match(...)`) are idiomatic.
  */
case class Truthy(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case BooleanType => child
    case NullType => Literal(null, BooleanType)
    case _: NumericType =>
      Not(EqualTo(child, Cast(Literal(0), child.dataType)))
    case other =>
      // unreachable past analysis (checkInputDataTypes rejects first);
      // keeps replacement total for canonicalization paths
      Cast(child, BooleanType)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BooleanType | NullType | _: NumericType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"a condition must be BOOLEAN or numeric (ClickHouse " +
          s"truthiness), got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "truthy"
  override protected def withNewChildInternal(newChild: Expression): Truthy =
    copy(child = newChild)
}

/** Special-function scalars (erf/erfc/lgamma/tgamma) over the shared
  * [[StatTests]] numerics — codegen'd static calls, no UDF. */
case class MathFn1(kind: String, child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = kind

  override def nullSafeEval(v: Any): Any =
    MathFn1.run(kind, v.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.MathFn1.run("$kind", $c)""")

  override protected def withNewChildInternal(newChild: Expression): MathFn1 =
    copy(child = newChild)
}

object MathFn1 {
  def run(kind: String, v: Double): Double = kind match {
    case "erf" => 1.0 - StatTests.erfc(v)
    case "erfc" => StatTests.erfc(v)
    case "lgamma" => StatTests.lnGamma(v)
    case "tgamma" =>
      if (v > 0) math.exp(StatTests.lnGamma(v))
      else if (v == math.floor(v)) Double.NaN // poles at 0, -1, -2, ...
      else math.Pi /
        (math.sin(math.Pi * v) * math.exp(StatTests.lnGamma(1.0 - v)))
    case other => throw new IllegalStateException(s"unknown fn $other")
  }
}

/** ClickHouse `proportionsZTest(s1, s2, t1, t2, conf, 'pooled' |
  * 'unpooled')` → (z_stat, p_value, ci_low, ci_high) — the two-sample
  * proportion z-test, closed-form over [[StatTests]]' normal
  * helpers. */
case class ProportionsZTest(args: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = args
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("z_stat", DoubleType), StructField("p_value", DoubleType),
    StructField("ci_low", DoubleType), StructField("ci_high", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (args.size == 6) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "proportionsZTest expects (successes_x, successes_y, trials_x, " +
        "trials_y, confidence, 'pooled'|'unpooled')")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Double](5)
    var i = 0
    while (i < 5) {
      args(i).eval(input) match {
        case null => return null
        case d: org.apache.spark.sql.types.Decimal => vals(i) = d.toDouble
        case n: Number => vals(i) = n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"proportionsZTest: numeric argument expected, got $other")
      }
      i += 1
    }
    val (sx, sy, tx, ty, conf) =
      (vals(0), vals(1), vals(2), vals(3), vals(4))
    val usePooled = args(5).eval(input) match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        s.toString.toLowerCase == "pooled"
      case _ => true
    }
    if (tx <= 0 || ty <= 0) return null
    val px = sx / tx
    val py = sy / ty
    val se =
      if (usePooled) {
        val p = (sx + sy) / (tx + ty)
        math.sqrt(p * (1 - p) * (1 / tx + 1 / ty))
      } else math.sqrt(px * (1 - px) / tx + py * (1 - py) / ty)
    val z = if (se == 0) 0.0 else (px - py) / se
    val p = StatTests.zTwoSidedP(z)
    val zc = StatTests.probitTwoSided(conf)
    val seCi = math.sqrt(px * (1 - px) / tx + py * (1 - py) / ty)
    org.apache.spark.sql.catalyst.InternalRow(
      z, p, (px - py) - zc * seCi, (px - py) + zc * seCi)
  }

  override def prettyName: String = "proportionsZTest"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ProportionsZTest =
    copy(args = newChildren)
}

/** ClickHouse `tupleHammingDistance(t1, t2)`: the count of
  * positionally differing fields — type-dispatched over the resolved
  * struct arity (null-safe equality, so two NULL fields match). */
case class TupleHamming(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression =
    (left.dataType, right.dataType) match {
      case (a: StructType, b: StructType) if a.size == b.size && a.nonEmpty =>
        a.indices.map { i =>
          If(EqualNullSafe(
            GetStructField(left, i), GetStructField(right, i)),
            Literal(0), Literal(1)): Expression
        }.reduce(Add(_, _))
      case _ => Literal(null, IntegerType)
    }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (a: StructType, b: StructType) if a.size == b.size =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"tupleHammingDistance expects two tuples of equal arity, got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "tupleHammingDistance"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TupleHamming =
    copy(left = newLeft, right = newRight)
}

/** ClickHouse `toJSONString(x)`: any value rendered as JSON text —
  * type-dispatched onto the native StructsToJson for containers, a
  * bracket-stripped array render for strings (correct JSON escaping
  * without a custom escaper), and a plain cast for numerics. */
case class ToJsonStringCH(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  override lazy val replacement: Expression = {
    val rendered = child.dataType match {
      case _: ArrayType | _: MapType | _: StructType =>
        StructsToJson(Map.empty, child, tz)
      case BooleanType | _: NumericType => Cast(child, StringType)
      case NullType => Literal("null")
      case _ =>
        // ["<escaped>"] minus the brackets = a correctly quoted JSON
        // string
        val arr = StructsToJson(Map.empty, CreateArray(Seq(child)), tz)
        Substring(arr, Literal(2),
          Subtract(Length(arr), Literal(2)))
    }
    Coalesce(Seq(rendered, Literal("null")))
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "toJSONString"
  override protected def withNewChildInternal(newChild: Expression): ToJsonStringCH =
    copy(child = newChild)
}

/** UInt64-key intake: ClickHouse hash keys are UInt64, and a pasted
  * literal above 2^63 (`kostikConsistentHash(16045690984833335023, 2)`)
  * parses in Spark as DECIMAL(20,0) — an ANSI cast to BIGINT throws
  * CAST_OVERFLOW. This wraps to the two's-complement Int64 instead
  * (BigInteger.longValue IS the mod-2^64 truncation), the engine's
  * documented 64-bit contract for UInt64 values. */
case class WrapInt64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "wrapInt64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected a numeric key, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case d: org.apache.spark.sql.types.Decimal =>
      d.toJavaBigDecimal.toBigInteger.longValue()
    case d: java.math.BigDecimal => d.toBigInteger.longValue()
    case n: Number => n.longValue()
  }

  override protected def withNewChildInternal(newChild: Expression): WrapInt64 =
    copy(child = newChild)
}

/** ClickHouse `empty`/`notEmpty`: one name over strings AND
  * arrays/maps (Spark's `length` is string-only, `size` is
  * container-only). Type-dispatched RuntimeReplaceable onto the
  * native codegen'd Length/Size. */
case class EmptyCH(child: Expression, negated: Boolean)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = {
    val n = child.dataType match {
      case _: ArrayType | _: MapType =>
        Size(child, legacySizeOfNull = false)
      case _ => Length(child)
    }
    if (negated) GreaterThan(n, Literal(0)) else EqualTo(n, Literal(0))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType | _: MapType | _: StringType | BinaryType |
          NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"empty expects a string, array or map, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = if (negated) "notEmpty" else "empty"
  override protected def withNewChildInternal(newChild: Expression): EmptyCH =
    copy(child = newChild)
}

/** ClickHouse `emptyArrayToSingle`: an empty array becomes the
  * one-element array of the element type's DEFAULT (0, '', epoch) —
  * type-dispatched, since the default is unknowable until the child
  * resolves. */
case class EmptyArrayToSingle(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) =>
      CaseWhen(
        Seq((EqualTo(Size(child, legacySizeOfNull = false), Literal(0)),
          CreateArray(Seq(Literal.default(et))))),
        Some(child))
    case _ => child
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"emptyArrayToSingle expects an array, got ${other.simpleString}")
    }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "emptyArrayToSingle"
  override protected def withNewChildInternal(
      newChild: Expression): EmptyArrayToSingle = copy(child = newChild)
}

/** ClickHouse `byteSize(x)`: the value's in-memory size. Fixed-width
  * types report their width; strings report CH's `length + 9`
  * (payload + size header); arrays/maps sum a 8-byte header with the
  * serialized element estimate via the type's default size. */
case class ByteSizeCH(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: StringType | BinaryType => Add(OctetLength(child), Literal(9))
    case ArrayType(et, _) =>
      Add(Multiply(Size(child, legacySizeOfNull = false),
        Literal(et.defaultSize)), Literal(8))
    case m: MapType =>
      Add(Multiply(Size(child, legacySizeOfNull = false),
        Literal(m.keyType.defaultSize + m.valueType.defaultSize)),
        Literal(8))
    case dt => Literal(dt.defaultSize)
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "byteSize"
  override protected def withNewChildInternal(newChild: Expression): ByteSizeCH =
    copy(child = newChild)
}

/** ClickHouse `round()` with CH's type-dependent tie rule: banker's
  * rounding (half-to-even) for Float32/Float64, but half-AWAY-from-zero
  * for Decimal — one name, two modes, dispatched on the resolved
  * argument type (Spark's `bround` is half-even, `round` is HALF_UP =
  * half-away for both signs). RuntimeReplaceable: the executed plan
  * carries the native codegen'd Round/BRound. */
case class RoundCH(child: Expression, scale: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = child
  override def right: Expression = scale

  override lazy val replacement: Expression = child.dataType match {
    case _: DecimalType => Round(child, scale)
    case _ => BRound(child, scale)
  }

  override def dataType: DataType = replacement.dataType
  override def prettyName: String = "round"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RoundCH =
    copy(child = newLeft, scale = newRight)
}

/** ClickHouse's `dateAdd(unit, n, x)` family with CH's RESULT TYPE:
  * a Date input with a day-or-coarser unit returns Date (CH), where
  * Spark's `dateadd`/`timestampadd` always return TIMESTAMP — visible
  * in every `{columns, rows}` payload (`2024-02-28 00:00:00.0` for a
  * pasted `dateSub('day', 2, toDate(...))`). RuntimeReplaceable: the
  * executed plan carries the native DateAdd/AddMonths/TimestampAdd.
  * The unit arrives pre-evaluated (the text shim always emits a
  * string literal). */
case class DateAddCH(unit: String, quantity: Expression, child: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = quantity
  override def right: Expression = child

  private def intQty = Cast(quantity, IntegerType)

  // the replacement tree never passes through the analyzer, so
  // timezone-aware nodes (TimestampAdd, Cast to TIMESTAMP) must carry
  // the session zone explicitly — ResolveTimeZone won't fill it in
  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
  private def tsAdd(u: String, x: Expression): Expression =
    new TimestampAdd(u, Cast(quantity, LongType), x, tz)

  override lazy val replacement: Expression = child.dataType match {
    case DateType => unit match {
      case "DAY" => DateAdd(child, intQty)
      case "WEEK" => DateAdd(child, Multiply(intQty, Literal(7)))
      case "MONTH" => AddMonths(child, intQty)
      case "QUARTER" => AddMonths(child, Multiply(intQty, Literal(3)))
      case "YEAR" => AddMonths(child, Multiply(intQty, Literal(12)))
      case finer => tsAdd(finer, Cast(child, TimestampType, tz))
    }
    case TimestampType | TimestampNTZType => tsAdd(unit, child)
    case _ => tsAdd(unit, Cast(child, TimestampType, tz))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (quantity.dataType, child.dataType) match {
      case (_: NumericType | NullType,
          DateType | TimestampType | TimestampNTZType | _: StringType |
          NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (q, c) => TypeCheckResult.TypeCheckFailure(
        s"dateAdd expects (numeric quantity, date/timestamp), got " +
          s"(${q.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = replacement.dataType
  override def prettyName: String = "dateAdd"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DateAddCH =
    copy(quantity = newLeft, child = newRight)
}

/** Parse-time rewrite installing [[Truthy]] at every boolean context of
  * an (unresolved) plan: Filter/Having/Join-ON conditions, `AND`/`OR`
  * operands, `NOT`, `If` predicates and `CASE WHEN` branch conditions —
  * the places ClickHouse coerces numerics and Spark's analyzer rejects
  * them. Applied by QueryGuard before analysis, so `SELECT * FROM
  * system.settings WHERE changed` answers instead of dying in
  * CheckAnalysis. Wrapping an already-boolean condition is the identity
  * (Truthy's replacement passes booleans through), so the rewrite is
  * blanket and type-blind — the types are not known until analysis.
  */
object Truthiness {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f: Filter =>
      f.copy(condition = wrap(fixExpr(f.condition)))
    case h: UnresolvedHaving =>
      h.copy(havingCondition = wrap(fixExpr(h.havingCondition)))
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(c => wrap(fixExpr(c))))
    case other => other.mapExpressions(fixExpr)
  }

  private def wrap(e: Expression): Expression = e match {
    case t: Truthy => t
    case other => Truthy(other)
  }

  private def fixExpr(e: Expression): Expression = e.transformUp {
    case And(l, r) => And(wrap(l), wrap(r))
    case Or(l, r) => Or(wrap(l), wrap(r))
    case Not(c) => Not(wrap(c))
    case i: If => i.copy(predicate = wrap(i.predicate))
    case cw: CaseWhen =>
      cw.copy(branches = cw.branches.map { case (c, v) => (wrap(c), v) })
    // `if(cond, a, b)` is still an UnresolvedFunction at parse time —
    // wrap its condition so the resolved If type-checks
    case uf: UnresolvedFunction
        if uf.nameParts.lastOption.exists(_.equalsIgnoreCase("if")) &&
          uf.arguments.size == 3 =>
      uf.copy(arguments = wrap(uf.arguments.head) +: uf.arguments.tail)
    // CH multiIf(c1, r1, c2, r2, ..., else): conditions at even indices
    case uf: UnresolvedFunction
        if uf.nameParts.lastOption.exists(_.equalsIgnoreCase("multiIf")) &&
          uf.arguments.size >= 3 =>
      uf.copy(arguments = uf.arguments.zipWithIndex.map { case (a, i) =>
        if (i % 2 == 0 && i < uf.arguments.size - 1) wrap(a) else a
      })
    case s: SubqueryExpression => s.withNewPlan(apply(s.plan))
  }
}

/** ClickHouse `minSampleSizeConversion(p1, mde, power, alpha)` and
  * `minSampleSizeContinuous(baseline, sigma, mde, power, alpha)` —
  * closed-form A/B-test power analysis (public two-sample formulas)
  * over [[StatTests]]' normal quantile. Returns CH's
  * (minimum_sample_size, detect_range_lower, detect_range_upper). */
case class MinSampleSize(conversion: Boolean, args: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = args
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("minimum_sample_size", DoubleType),
    StructField("detect_range_lower", DoubleType),
    StructField("detect_range_upper", DoubleType)))

  private def arity: Int = if (conversion) 4 else 5
  private def name: String =
    if (conversion) "minSampleSizeConversion" else "minSampleSizeContinuous"

  override def checkInputDataTypes(): TypeCheckResult =
    if (args.size == arity) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      if (conversion) s"$name expects (baseline_rate, mde, power, alpha)"
      else s"$name expects (baseline_mean, sigma, mde, power, alpha)")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Double](arity)
    var i = 0
    while (i < arity) {
      args(i).eval(input) match {
        case null => return null
        case d: org.apache.spark.sql.types.Decimal => vals(i) = d.toDouble
        case n: Number => vals(i) = n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"$name: numeric argument expected, got $other")
      }
      i += 1
    }
    val (power, alpha) = (vals(arity - 2), vals(arity - 1))
    val zA = StatTests.probitTwoSided(1.0 - alpha)       // z_{1-α/2}
    val zB = StatTests.probitTwoSided(2.0 * power - 1.0) // z_{power}
    val row = new GenericInternalRow(3)
    if (conversion) {
      val p1 = vals(0); val mde = vals(1); val p2 = p1 + mde
      val n = math.pow(zA + zB, 2) *
        (p1 * (1 - p1) + p2 * (1 - p2)) / (mde * mde)
      row(0) = n; row(1) = p1 - mde; row(2) = p1 + mde
    } else {
      val base = vals(0); val sigma = vals(1); val mde = vals(2)
      val n = 2.0 * math.pow(zA + zB, 2) * sigma * sigma /
        math.pow(base * mde, 2)
      row(0) = n; row(1) = base * (1 - mde); row(2) = base * (1 + mde)
    }
    row
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinSampleSize =
    copy(args = newChildren)
}

/** ClickHouse `byteSwap(x)`: reverses the bytes of the integer within
  * its own width (8-bit identity, 16/32/64-bit swaps), dispatched on
  * the resolved Spark type onto the JDK's intrinsified reverseBytes.
  * CH's unsigned types ride this engine's widened signed carriers, so
  * a value that arrives as BIGINT swaps as 64-bit — pin the narrower
  * width with toInt32/toInt16 first (documented deviation).
  * RuntimeReplaceable: the executed plan carries a codegen'd
  * StaticInvoke. */
case class ByteSwapCH(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression =
    ChBitWidthOp.build(child, Literal(0), "swap")

  override def dataType: DataType = replacement.dataType
  override def prettyName: String = "byteSwap"
  override protected def withNewChildInternal(newChild: Expression): ByteSwapCH =
    copy(child = newChild)
}

/** Width-aware bit operations: ClickHouse evaluates bitNot /
  * bitRotateLeft/Right / byteSwap in the argument's INTEGER TYPE
  * width — `bitNot(toUInt8(1))` = 254, `bitRotateLeft(toUInt8(129),
  * 1)` = 3, `byteSwap(3351772109)` swaps 4 bytes (the literal types
  * as UInt32). The width comes from the declared-conversion tag when
  * present, CH's smallest-type literal inference for foldable
  * arguments, or the resolved storage type. Carried in Int64;
  * unsigned widths answer the non-negative value, signed widths
  * sign-extend. (UInt64's top bit exceeds the Int64 carrier — the
  * pack's documented UInt64 bound.) */
case class ChBitWidthOp(child: Expression, amount: Expression, op: String)
    extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = child
  override def right: Expression = amount

  override lazy val replacement: Expression =
    ChBitWidthOp.build(child, amount, op)

  override def prettyName: String = op match {
    case "not" => "bitNot"
    case "rotl" => "bitRotateLeft"
    case "rotr" => "bitRotateRight"
    case _ => "byteSwap"
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ChBitWidthOp = copy(child = l, amount = r)
}

object ChBitWidthOp {

  /** (bits, signed) of the CH-typed reading of `e`. */
  def widthOf(e: Expression): (Int, Boolean) = {
    val tagged = e.getTagValue(CHFunctions.chDeclaredTypeTag).flatMap { t0 =>
      val t = t0.stripPrefix("Nullable(").stripSuffix(")")
      val m = "^(U?)Int(8|16|32|64)".r.findFirstMatchIn(t)
      m.map(g => (g.group(2).toInt, g.group(1).isEmpty))
    }
    tagged.orElse {
      // CH types a BARE literal as the smallest fitting type —
      // non-negative unsigned, negative signed. Only bare literals:
      // an explicit CAST(1 AS BIGINT) keeps its declared width.
      e match {
        case Literal(n: java.lang.Number, ByteType | ShortType |
            IntegerType | LongType) =>
          val v = n.longValue()
          Some(if (v >= 0) {
            if (v < 256L) (8, false)
            else if (v < 65536L) (16, false)
            else if (v < 4294967296L) (32, false)
            else (64, false)
          } else {
            if (v >= -128L) (8, true)
            else if (v >= -32768L) (16, true)
            else if (v >= -2147483648L) (32, true)
            else (64, true)
          })
        case _ => None
      }
    }.getOrElse(e.dataType match {
      case ByteType => (8, true)
      case ShortType => (16, true)
      case IntegerType => (32, true)
      case BooleanType => (8, false)
      case _ => (64, true)
    })
  }

  def build(child: Expression, amount: Expression, op: String): Expression = {
    val (w, signed) = widthOf(child)
    val mask = Literal(if (w == 64) -1L else (1L << w) - 1)
    val v = BitwiseAnd(Cast(child, LongType), mask)
    def signAdj(e: Expression): Expression =
      if (!signed || w == 64) e
      else Subtract(e, If(GreaterThanOrEqual(e, Literal(1L << (w - 1))),
        Literal(1L << w), Literal(0L)))
    op match {
      case "not" =>
        if (w == 64) BitwiseNot(Cast(child, LongType))
        else signAdj(BitwiseAnd(BitwiseNot(v), mask))
      case "shl" | "shr" =>
        // overflow bits DISCARD within the width; a shift amount at
        // or past the width (or negative) answers 0 — CH's contract,
        // where a Java shift would mask the amount mod 64
        val s = Cast(amount, IntegerType)
        val outOfRange = Or(LessThan(s, Literal(0)),
          GreaterThanOrEqual(s, Literal(w)))
        val shifted =
          if (op == "shl") signAdj(BitwiseAnd(ShiftLeft(v, s), mask))
          else if (signed)
            // arithmetic shift on the sign-extended value
            ShiftRight(signAdj(v), s)
          else ShiftRightUnsigned(v, s)
        If(outOfRange, Literal(0L), shifted)
      case "rotl" | "rotr" =>
        val nIn = Cast(amount, IntegerType)
        val s = Pmod(if (op == "rotl") nIn else UnaryMinus(nIn), Literal(w))
        // s = 0 short-circuits: a Java shift by w masks mod 64, so
        // `v >>> (w - 0)` would NOT be zero for w = 64
        val rot = BitwiseAnd(BitwiseOr(
          ShiftLeft(v, s),
          ShiftRightUnsigned(v, Subtract(Literal(w), s))), mask)
        signAdj(If(EqualTo(s, Literal(0)), v, rot))
      case _ => // swap: reverse the w/8 bytes
        val bytes = w / 8
        val parts = (0 until bytes).map { i =>
          ShiftLeft(BitwiseAnd(ShiftRightUnsigned(v, Literal(8 * i)),
            Literal(0xFFL)), Literal(8 * (bytes - 1 - i))): Expression
        }
        signAdj(parts.reduce(BitwiseOr))
    }
  }
}

/** ClickHouse `bitSlice(s, offset[, length])`: the substring of the
  * string's BITS — `offset` is 1-based (negative counts from the end),
  * `length` optional (to the end; negative leaves |length| bits off
  * the tail). The result packs the selected bits MSB-first and
  * zero-pads the final byte, exactly CH's layout, so
  * `bitSlice('Hello', 1, 8) = 'H'` and a 4-bit slice of 0b0100_1000
  * yields 0b0100_0000 ('@'). Interpreted eval (CodegenFallback): a
  * per-row bit copy over small strings is not a hot-path shape. */
case class BitSliceCH(str: Expression, off: Expression, len: Expression)
    extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def first: Expression = str
  override def second: Expression = off
  override def third: Expression = len

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bitSlice"

  override def checkInputDataTypes(): TypeCheckResult =
    if ((str.dataType == StringType || str.dataType == BinaryType) &&
      Seq(off, len).forall(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bitSlice expects (string, int offset[, int length])")

  override protected def nullSafeEval(s: Any, o: Any, l: Any): Any = {
    val bytes = s match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.getBytes
      case b: Array[Byte] => b
    }
    val totalBits = bytes.length * 8
    val offV = o.asInstanceOf[Number].longValue()
    val start = (if (offV > 0) offV - 1 else totalBits + offV).max(0).toInt
    if (start >= totalBits) {
      return org.apache.spark.unsafe.types.UTF8String.fromBytes(Array.emptyByteArray)
    }
    val lenV = l.asInstanceOf[Number].longValue()
    val n = (if (lenV >= 0) lenV.min(totalBits - start)
      else (totalBits - start + lenV).max(0)).toInt
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val src = start + i
      val bit = (bytes(src >> 3) >> (7 - (src & 7))) & 1
      out(i >> 3) = (out(i >> 3) | (bit << (7 - (i & 7)))).toByte
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BitSliceCH =
    copy(str = f, off = s, len = t)
}

/** ClickHouse `tupleToNameValuePairs(t)`: a named tuple becomes
  * `[(name, value), ...]` — the struct's OWN field names as data.
  * RuntimeReplaceable on the resolved struct type; the replacement is
  * a plain CreateArray of two-field structs, so it stays codegen'd.
  * Heterogeneous field types coerce like any array literal (CH
  * requires a common type too). */
case class TupleToNameValuePairs(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case st: StructType =>
      CreateArray(st.fields.zipWithIndex.map { case (f, i) =>
        CreateNamedStruct(Seq(Literal("name"), Literal(f.name),
          Literal("value"), GetStructField(child, i, Some(f.name))))
          : Expression
      }.toSeq)
    case other => throw new IllegalArgumentException(
      s"tupleToNameValuePairs expects a tuple, got ${other.simpleString(40)}")
  }

  override def dataType: DataType = replacement.dataType
  override def prettyName: String = "tupleToNameValuePairs"
  override protected def withNewChildInternal(
      newChild: Expression): TupleToNameValuePairs = copy(child = newChild)
}

/** Positional struct-field access for builders that cannot know the
  * field NAMES pre-analysis (a pasted tuple literal resolves to
  * col1/col2, a `tuple(x, y)` over columns to x/y — the geo folds
  * need "field 0" / "field 1" either way). RuntimeReplaceable: once
  * the child resolves the replacement is a plain GetStructField,
  * codegen'd like any projection. */
case class StructAt(child: Expression, idx: Int) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case st: StructType if st.fields.length > idx =>
      GetStructField(child, idx, Some(st.fields(idx).name))
    case other => throw new IllegalArgumentException(
      s"expected a tuple with > $idx fields, got ${other.simpleString(40)}")
  }

  override def dataType: DataType = replacement.dataType
  override def prettyName: String = s"tupleElement_$idx"
  override protected def withNewChildInternal(newChild: Expression): StructAt =
    copy(child = newChild)
}

/** ClickHouse `wkt(g)`: well-known text of the tuple/array geometry
  * shapes — Point `(x, y)` → `POINT(x y)`, Array(Point) →
  * `LINESTRING(...)`, Array(Ring) → `POLYGON((...))`, Array(Polygon)
  * → `MULTIPOLYGON(((...)))`. RuntimeReplaceable on the resolved
  * type; the replacement is built FULLY RESOLVED (ReplaceExpressions
  * swaps it in after analysis, so no Unresolved* may remain —
  * lambdas bind their own NamedLambdaVariable). Numbers render
  * minimally (a trailing `.0` drops, like CH's float printing). */
case class WktCH(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  private def num(e: Expression): Expression =
    RegExpReplace(Cast(e, StringType), Literal("\\.0$"), Literal(""))

  private def pointBody(p: Expression, st: StructType): Expression =
    Concat(Seq(num(GetStructField(p, 0, Some(st.fields(0).name))),
      Literal(" "), num(GetStructField(p, 1, Some(st.fields(1).name)))))

  private def joined(arr: Expression, et: DataType,
      render: Expression => Expression): Expression = {
    val v = NamedLambdaVariable("wkx", et, nullable = true)
    ArrayJoin(
      ArrayTransform(arr, LambdaFunction(render(v), Seq(v))),
      Literal(","), None)
  }

  override lazy val replacement: Expression = child.dataType match {
    case st: StructType =>
      Concat(Seq(Literal("POINT("), pointBody(child, st), Literal(")")))
    case ArrayType(st: StructType, _) =>
      Concat(Seq(Literal("LINESTRING("),
        joined(child, st, pointBody(_, st)), Literal(")")))
    case ArrayType(rt @ ArrayType(st: StructType, _), _) =>
      Concat(Seq(Literal("POLYGON("),
        joined(child, rt, r => Concat(Seq(Literal("("),
          joined(r, st, pointBody(_, st)), Literal(")")))),
        Literal(")")))
    case ArrayType(pt @ ArrayType(rt @ ArrayType(st: StructType, _), _), _) =>
      Concat(Seq(Literal("MULTIPOLYGON("),
        joined(child, pt, poly => Concat(Seq(Literal("("),
          joined(poly, rt, r => Concat(Seq(Literal("("),
            joined(r, st, pointBody(_, st)), Literal(")")))),
          Literal(")")))),
        Literal(")")))
    case other => throw new IllegalArgumentException(
      s"wkt expects a tuple/array geometry, got ${other.simpleString(40)}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "wkt"
  override protected def withNewChildInternal(newChild: Expression): WktCH =
    copy(child = newChild)
}
