package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Offset}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** ClickHouse date/time arithmetic semantics over Spark's chrono types
  * (reference surface: any pasted CH SELECT through
  * mcp_clickhouse/mcp_server.py:433-459, where `now() - 3600`,
  * `toDateTime(x) + 86400` and `max(d) - min(d)` are everyday idioms):
  *
  *   - `Date - Date` is **Int32 days** and `DateTime - DateTime` is
  *     **Int32 seconds** — Spark returns a DayTimeInterval for both,
  *     which both diverges from CH and (pre-round-15) leaked a
  *     `java.time.Duration` repr like `"PT24H"` onto the wire;
  *   - `DateTime ± Int` adds/subtracts **seconds** — Spark has no rule
  *     for TIMESTAMP ± integral at all and dies in DATATYPE_MISMATCH.
  *
  * Both are parse-time plan transforms in the [[Truthiness]] mold
  * (types are unknown until analysis, so the wrappers are type-blind
  * [[RuntimeReplaceable]]s that dispatch once their children resolve,
  * then optimize away to plain codegen'd expressions):
  *
  *   - [[ChronoArith.diffs]] runs on EVERY served statement: it wraps
  *     each parsed `Subtract` in [[ChronoDiff]], whose replacement is
  *     the CH integer when analysis resolved the child to
  *     SubtractDates/SubtractTimestamps and the **identity**
  *     otherwise — a currently-green query cannot change behavior.
  *   - [[ChronoArith.shifts]] is the DATATYPE_MISMATCH retry: it
  *     re-wraps `Add`/`Subtract` as [[ChronoShift]] over the operands,
  *     which reproduces Spark's own chrono dispatch plus CH's
  *     TIMESTAMP ± seconds rule. Only statements Spark itself already
  *     rejected take this path, so its hand-rolled numeric widening
  *     (TypeCoercion.findWiderTypeForTwo) can never touch a working
  *     plan.
  *
  * LIMIT/OFFSET expressions and window-frame bounds are excluded: the
  * analyzer eval()s those during checkAnalysis, and RuntimeReplaceable
  * nodes are not evaluable until the optimizer swaps in the
  * replacement.
  */
object ChronoArith {

  /** Phase A — unconditional: CH difference semantics for date/time
    * subtraction, identity for everything else. */
  def diffs(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case l: GlobalLimit => l
    case l: LocalLimit => l
    case o: Offset => o
    case other => other.mapExpressions(fixDiff)
  }

  private def fixDiff(e: Expression): Expression = e.transformUp {
    case s: Subtract => ChronoDiff(s)
    // frame bounds are evaluated during analysis — unwrap anything the
    // bottom-up pass installed inside the frame spec
    case w: SpecifiedWindowFrame =>
      w.transformUp { case ChronoDiff(c) => c }
    case s: SubqueryExpression => s.withNewPlan(diffs(s.plan))
  }

  /** Phase B — retry-only: full CH arithmetic dispatch over `+`/`-`
    * operands (TIMESTAMP ± Int seconds included). */
  def shifts(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case l: GlobalLimit => l
    case l: LocalLimit => l
    case o: Offset => o
    case other => other.mapExpressions(fixShift)
  }

  private def fixShift(e: Expression): Expression = e.transformUp {
    case Add(l, r, _) => ChronoShift(l, r, plus = true)
    case Subtract(l, r, _) => ChronoShift(l, r, plus = false)
    case w: SpecifiedWindowFrame =>
      w.transformUp { case c: ChronoShift => c.plain }
    case s: SubqueryExpression => s.withNewPlan(shifts(s.plan))
  }
}

/** Wraps a parsed `Subtract`; once analysis resolves the child, a
  * date−date becomes CH's Int32 **days** and a timestamp−timestamp
  * CH's Int32 **seconds**; any other child passes through untouched.
  * The seconds form is scoped to TimestampType operands (UnixSeconds
  * speaks exactly that), so an NTZ or exotic operand keeps Spark's
  * native result rather than half-translating. */
object ChronoDiff {
  /** Matches DateTime64(p) inside a declared-type tag (also through a
    * Nullable(...) wrapper). */
  private[functions] val dt64Scale = """DateTime64\((\d+)\)""".r
}

case class ChronoDiff(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression = child match {
    case SubtractDates(l, r, _)
        if l.dataType == DateType && r.dataType == DateType =>
      DateDiff(l, r)
    // any timestamp flavor (session-tz or NTZ — the parquet tables
    // carry NTZ): the day-time interval's end field is SECOND, so the
    // integral cast IS the total-seconds count
    case st: SubtractTimestamps
        if st.dataType.isInstanceOf[DayTimeIntervalType] =>
      // a DateTime64(p) operand (declared-type tag from the
      // toDateTime64 builder) makes the difference CH's DECIMAL
      // seconds at the max declared scale — `dt64_a - dt64_b` of
      // .350 vs .100 answers 0.250, not 0. Plain DateTime operands
      // keep CH's Int32 seconds.
      val scale = Seq(st.left, st.right)
        .flatMap(_.getTagValue(CHFunctions.chDeclaredTypeTag))
        .flatMap(t => ChronoDiff.dt64Scale.findFirstMatchIn(t)
          .map(_.group(1).toInt))
        .reduceOption(_ max _).map(_ min 6)
      scale match {
        case Some(p) if p > 0 &&
            st.left.dataType == TimestampType &&
            st.right.dataType == TimestampType =>
          // exact decimal arithmetic: micros → Decimal(20,6) ÷ 10^6
          // (a Double intermediate loses the last digit on
          // multi-decade intervals — double ulp at 1.6e9 s is ~2e-7)
          Cast(Divide(
            Cast(Subtract(UnixMicros(st.left), UnixMicros(st.right)),
              DecimalType(26, 6)),
            Literal(Decimal(1000000L), DecimalType(7, 0))),
            DecimalType(20, p))
        case _ => Cast(st, IntegerType)
      }
    case other => other
  }

  override def dataType: DataType = replacement.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minus"
  override protected def withNewChildInternal(newChild: Expression): ChronoDiff =
    copy(child = newChild)
}

/** Retry-path `+`/`-` over resolved operands: reproduces Spark's
  * chrono dispatch (date ± int, date/timestamp ± interval, date−date,
  * ts−ts via [[ChronoDiff]] semantics) plus ClickHouse's
  * `DateTime ± Int = seconds` rule that Spark lacks. Numeric operands
  * widen via TypeCoercion (the analyzer cannot insert implicit casts
  * inside a replacement); anything unexpressible falls through to the
  * plain operator and fails with Spark's own loud mismatch — exactly
  * the pre-retry behavior. */
case class ChronoShift(left: Expression, right: Expression, plus: Boolean)
    extends BinaryExpression with RuntimeReplaceable {

  /** The untouched Spark operator (also used to unwrap frame bounds). */
  def plain: Expression = if (plus) Add(left, right) else Subtract(left, right)

  private def tz: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private def seconds(e: Expression): Expression = {
    val q = Cast(e, LongType)
    if (plus) q else UnaryMinus(q, failOnError = false)
  }

  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType
  private def isInt(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override lazy val replacement: Expression =
    (left.dataType, right.dataType) match {
      // CH: DateTime ± Int = shift by seconds (the round-14 gap);
      // TimestampAdd speaks both timestamp flavors and preserves them
      case (lt, rt) if isTs(lt) && isInt(rt) =>
        TimestampAdd("SECOND", seconds(right), left, tz)
      case (lt, rt) if isInt(lt) && isTs(rt) && plus =>
        TimestampAdd("SECOND", Cast(left, LongType), right, tz)
      // CH: Date ± Int = shift by days (Spark speaks this natively,
      // but inside a replacement the dispatch is ours)
      case (DateType, rt) if isInt(rt) =>
        if (plus) DateAdd(left, right) else DateSub(left, right)
      case (lt, DateType) if isInt(lt) && plus => DateAdd(right, left)
      // CH differences: Int32 days / seconds
      case (DateType, DateType) if !plus => DateDiff(left, right)
      case (lt, rt) if isTs(lt) && isTs(rt) && !plus =>
        Cast(SubtractTimestamps(left, right, legacyInterval = false, tz),
          IntegerType)
      // Spark's own interval dispatch, reproduced for mixed statements
      // (one query carrying both `ts + 3600` and `d + INTERVAL 1 DAY`)
      case (DateType, _: YearMonthIntervalType) =>
        DateAddYMInterval(left, ym(right))
      case (_: YearMonthIntervalType, DateType) if plus =>
        DateAddYMInterval(right, left)
      case (lt, _: YearMonthIntervalType) if isTs(lt) =>
        TimestampAddYMInterval(left, ym(right), tz)
      case (_: YearMonthIntervalType, rt) if isTs(rt) && plus =>
        TimestampAddYMInterval(right, left, tz)
      case (DateType, CalendarIntervalType) =>
        DateAddInterval(left, cal(right), tz, ansiEnabled = true)
      case (CalendarIntervalType, DateType) if plus =>
        DateAddInterval(right, left, tz, ansiEnabled = true)
      case (lt, CalendarIntervalType | _: DayTimeIntervalType) if isTs(lt) =>
        TimestampAddInterval(left, dt(right), tz)
      case (CalendarIntervalType | _: DayTimeIntervalType, rt)
          if isTs(rt) && plus =>
        TimestampAddInterval(right, left, tz)
      case (DateType, _: DayTimeIntervalType) =>
        TimestampAddInterval(Cast(left, TimestampType, tz), dt(right), tz)
      case (_: DayTimeIntervalType, DateType) if plus =>
        TimestampAddInterval(Cast(right, TimestampType, tz), left, tz)
      // same-type or widenable numerics: plain operator, explicit casts
      case (lt, rt) if lt == rt => plain
      case (lt, rt) =>
        TypeCoercion.findWiderTypeForTwo(lt, rt).map { w =>
          val lw = if (lt == w) left else Cast(left, w)
          val rw = if (rt == w) right else Cast(right, w)
          if (plus) Add(lw, rw) else Subtract(lw, rw)
        }.getOrElse(plain)
    }

  /** Subtracting an interval = adding its negation (the interval-typed
    * UnaryMinus is exact, no overflow mode). */
  private def ym(e: Expression): Expression =
    if (plus) e else UnaryMinus(e, failOnError = false)
  private def cal(e: Expression): Expression =
    if (plus) e else UnaryMinus(e, failOnError = false)
  private def dt(e: Expression): Expression =
    if (plus) e else UnaryMinus(e, failOnError = false)

  override def dataType: DataType = replacement.dataType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = if (plus) "plus" else "minus"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChronoShift =
    copy(left = newLeft, right = newRight)
}

/** Pre-analysis rewrites for ClickHouse spellings that are WINDOW
  * functions in CH but have no Spark window counterpart — the name
  * must be replaced while it still sits inside the parsed
  * `WindowExpression` (a registry builder only sees the argument list,
  * and the building blocks Spark does have, `lag`, are themselves
  * window functions that need the SAME OVER spec).
  *
  * `nonNegativeDerivative(metric, ts[, INTERVAL n unit]) OVER (w)` —
  * CH's per-second (or per-interval) rate of change, clamped at zero:
  *   greatest(0, (metric − lag(metric) OVER w)
  *                 / (epoch_seconds(ts) − lag(...) OVER w) × k)
  * with the first row (and a zero time step, which divides to NULL)
  * answering 0, matching CH. The rewrite emits plain `Lag`s over the
  * user's own window spec, so the analyzer resolves frames and the
  * optimizer plans one ordinary Window node — fully codegen'd, no
  * custom eval. */
object WindowShims {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p => p.transformExpressionsUp {
      // parametric collectors OVER a window: the registered builder
      // wraps the aggregate in a slice (the cap), which is not a
      // valid window-function ROOT — hoist the cap outside the
      // WindowExpression so the bare collector is what the window
      // evaluates: groupArray(n)(x) OVER w = slice(collect_list(x)
      // OVER w, 1, n), exactly the builder's semantics per frame.
      case WindowExpression(
          uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction, spec)
          if uf.nameParts.length == 1 && uf.arguments.size == 2 &&
            Seq("grouparray", "groupuniqarray")
              .contains(uf.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        val Seq(n, x) = uf.arguments
        val inner =
          if (uf.nameParts.head.equalsIgnoreCase("groupArray")) "collect_list"
          else "collect_set"
        Slice(
          WindowExpression(
            org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
              Seq(inner), Seq(x), isDistinct = false), spec),
          Literal(1), Cast(n, IntegerType))
      case WindowExpression(
          uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction, spec)
          if uf.nameParts.length == 1 &&
            uf.nameParts.head.equalsIgnoreCase("nonNegativeDerivative") =>
        val args = uf.arguments
        require(args.size == 2 || args.size == 3,
          "nonNegativeDerivative takes (metric, timestamp[, interval])")
        val m = Cast(args(0), DoubleType)
        val tSec = Cast(Cast(args(1), TimestampType), DoubleType)
        def lagOf(e: Expression): Expression =
          WindowExpression(Lag(e, Literal(1), Literal(null), false), spec)
        val k = if (args.size == 3) intervalSeconds(args(2)) else 1.0
        val raw = Multiply(
          Divide(Subtract(m, lagOf(m)), Subtract(tSec, lagOf(tSec))),
          Literal(k))
        val nz = Coalesce(Seq(raw, Literal(0d)))
        If(LessThan(nz, Literal(0d)), Literal(0d), nz)
    }
  }

  /** Seconds in a constant interval argument: ANSI day-time intervals
    * carry micros, year-month carry months (CH's 30-day month),
    * legacy CalendarInterval mixes all three; a bare number is taken
    * as seconds like CH's own overload. */
  private def intervalSeconds(e: Expression): Double = e match {
    case Literal(v: java.lang.Long, DayTimeIntervalType(_, _)) => v / 1e6
    case Literal(v: java.lang.Integer, YearMonthIntervalType(_, _)) =>
      v * 2592000.0
    case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval, CalendarIntervalType) =>
      ci.months * 2592000.0 + ci.days * 86400.0 + ci.microseconds / 1e6
    case other if other.foldable => other.eval() match {
      case n: Number => n.doubleValue()
      case x => throw new IllegalArgumentException(
        s"nonNegativeDerivative interval must be a constant, got $x")
    }
    case _ => throw new IllegalArgumentException(
      "nonNegativeDerivative interval must be a constant INTERVAL or number")
  }
}

/** ClickHouse treats Bool as UInt8, so `sum(cond)` counts matches and
  * `avg(cond)` is the share of matching rows — the everyday pasted
  * idiom `avg(status = 'ok')`. Spark's Sum/Average reject BOOLEAN at
  * analysis, so this rides the same DATATYPE_MISMATCH-retry lane as
  * [[ChronoArith.shifts]]: only a statement Spark already rejected
  * takes the rewritten path, and the wrapper is the IDENTITY for any
  * non-boolean argument (a RuntimeReplaceable that optimizes away),
  * so no working plan can change. */
object BoolAggs {

  /** sum/avg name family (lowercase): the value argument is HEAD for
    * every one of these registrations. */
  private val names = Set(
    "sum", "avg", "mean", "sumif", "avgif", "sumornull", "avgornull",
    "sumordefault", "avgordefault", "sumdistinct", "avgdistinct",
    "sumkahan", "sumcount")

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case l: GlobalLimit => l
    case l: LocalLimit => l
    case o: Offset => o
    case other => other.mapExpressions(fix)
  }

  private def fix(e: Expression): Expression = e.transformUp {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.size == 1 &&
          names(f.nameParts.head.toLowerCase) &&
          f.arguments.nonEmpty &&
          !f.arguments.head.isInstanceOf[BoolToNum] =>
      f.copy(arguments = BoolToNum(f.arguments.head) +: f.arguments.tail)
    case s: SubqueryExpression => s.withNewPlan(apply(s.plan))
  }
}

/** Identity for every type except BOOLEAN, which casts to Int32 —
  * CH's Bool-is-UInt8 numeric reading. Type-blind until analysis
  * resolves the child (the [[ChronoDiff]] mold). */
case class BoolToNum(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {

  override lazy val replacement: Expression =
    if (child.dataType == BooleanType) Cast(child, IntegerType) else child

  override def dataType: DataType = replacement.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "toUInt8"
  override protected def withNewChildInternal(c: Expression): BoolToNum =
    copy(child = c)
}

/** ClickHouse tuple comparisons — `(a, b) > (10, 0)` lexicographic —
  * die in Spark when the two struct operands carry different field
  * NAMES (a pasted tuple literal gets col1/col2 against the column
  * side's own names) or unwidened field types, and the analyzer
  * cannot repair them because struct coercion requires matching
  * names. Retry-only transform ([[BoolAggs]] lane), gated to
  * comparisons with a PARSED tuple constructor on either side so an
  * ordinary scalar comparison never takes the hand-coerced path: the
  * failed node is REBUILT from its operands ([[ChronoShift]] mold —
  * a wrapper around the unresolvable node would never resolve), and
  * once the operands resolve, struct sides are normalized to one
  * positional shape (canonical c1..cn names, pairwise-widened field
  * types via TypeCoercion). Non-struct operands rebuild the original
  * comparison unchanged. */
object TupleCmps {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case l: GlobalLimit => l
    case l: LocalLimit => l
    case o: Offset => o
    case other => other.mapExpressions(fix)
  }

  /** A parsed tuple literal: the parser's struct constructor or the
    * dialect spellings tuple()/struct() before resolution. */
  private def isTupleCtor(e: Expression): Boolean = e match {
    case _: CreateNamedStruct => true
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      f.nameParts.size == 1 &&
        Set("struct", "tuple")(f.nameParts.head.toLowerCase)
    case _ => false
  }

  private def fix(e: Expression): Expression = e.transformUp {
    case c: BinaryComparison
        if isTupleCtor(c.left) || isTupleCtor(c.right) =>
      TupleCmp(c.left, c.right, TupleCmp.symbolOf(c))
    case in @ In(v, list)
        if list.nonEmpty && (isTupleCtor(v) || list.exists(isTupleCtor)) =>
      TupleIn(v, in.list)
    case s: SubqueryExpression => s.withNewPlan(apply(s.plan))
  }

  /** Positionally renamed (c1..cn) struct with each field cast to the
    * paired wider type. */
  private[functions] def normalize(
      e: Expression, own: StructType, widened: Seq[DataType]): Expression =
    CreateNamedStruct(widened.zipWithIndex.toSeq.flatMap { case (t, i) =>
      Seq(Literal(s"c${i + 1}"),
        Cast(GetStructField(e, i, Some(own.fields(i).name)), t))
    })

  private[functions] def widths(
      l: StructType, r: StructType): Option[Seq[DataType]] = {
    if (l.size != r.size) return None
    val ws = l.fields.zip(r.fields).map { case (lf, rf) =>
      TypeCoercion.findWiderTypeForTwo(lf.dataType, rf.dataType) }
    if (ws.forall(_.isDefined)) Some(ws.map(_.get).toSeq) else None
  }

  /** Both sides as one positional struct shape, or None when either
    * side is not a struct / no field pair widens. */
  private[functions] def aligned(
      l: Expression, r: Expression): Option[(Expression, Expression)] =
    (l.dataType, r.dataType) match {
      case (lt: StructType, rt: StructType) =>
        widths(lt, rt).map(ws =>
          (normalize(l, lt, ws), normalize(r, rt, ws)))
      case _ => None
    }
}

case class TupleCmp(left: Expression, right: Expression, symbol: String)
    extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = {
    val (l, r) = TupleCmps.aligned(left, right).getOrElse((left, right))
    TupleCmp.build(symbol, l, r)
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = symbol
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TupleCmp =
    copy(left = l, right = r)
}

object TupleCmp {
  def symbolOf(c: BinaryComparison): String = c match {
    case _: EqualNullSafe => "<=>"
    case _: EqualTo => "="
    case _: GreaterThan => ">"
    case _: GreaterThanOrEqual => ">="
    case _: LessThan => "<"
    case _ => "<="
  }

  def build(symbol: String, l: Expression, r: Expression): Expression =
    symbol match {
      case "<=>" => EqualNullSafe(l, r)
      case "=" => EqualTo(l, r)
      case ">" => GreaterThan(l, r)
      case ">=" => GreaterThanOrEqual(l, r)
      case "<" => LessThan(l, r)
      case _ => LessThanOrEqual(l, r)
    }
}

/** `(a, b) IN ((1, 2), (3, 4))` — the value and every list element
  * normalize to one positional struct shape (field types widened
  * across the whole list). */
case class TupleIn(value: Expression, list: Seq[Expression])
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = value +: list

  override lazy val replacement: Expression = value.dataType match {
    case l: StructType
        if list.forall(_.dataType.isInstanceOf[StructType]) =>
      val widened = list.foldLeft(Option(l.fields.map(_.dataType).toSeq)) {
        case (Some(acc), e) =>
          TupleCmps.widths(
            StructType(acc.zipWithIndex.map { case (t, i) =>
              StructField(s"c${i + 1}", t) }),
            e.dataType.asInstanceOf[StructType])
        case (None, _) => None
      }
      widened match {
        case Some(ws) =>
          In(TupleCmps.normalize(value, l, ws),
            list.map(e => TupleCmps.normalize(
              e, e.dataType.asInstanceOf[StructType], ws)))
        case None => In(value, list)
      }
    case _ => In(value, list)
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = replacement.nullable
  override def prettyName: String = "in"
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TupleIn =
    copy(value = cs.head, list = cs.tail.toSeq)
}
