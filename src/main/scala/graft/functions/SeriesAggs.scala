package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Ordered-series aggregates under ClickHouse names (reference
  * dialect: deltaSumTimestamp / intervalLengthSum / maxIntersections).
  * Each buffers its group's (a, b) pairs and sorts once at eval — the
  * same memory contract as ClickHouse's implementations (order-
  * sensitive math cannot partial-aggregate without losing exactness;
  * the group, not the table, must fit in memory). Ties sort by the
  * second component too, so results are partition-order-independent
  * and replay exactly in any engine that applies the same tie rule.
  */
abstract class PairBufferAgg
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]] {

  def a: Expression
  def b: Expression

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av != null && bv != null)
      buf += ((StatTests.asDouble(av), StatTests.asDouble(bv)))
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    buf ++= other; buf
  }

  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 + buf.length * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (x, y) => out.writeDouble(x); out.writeDouble(y) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Double)](n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readDouble())); i += 1 }
    buf
  }
}

/** deltaSumTimestamp(value, ts) → Σ of the positive steps of `value`
  * when the group is ordered by `ts` (ties by value). */
case class DeltaSumTsAgg(
    value: Expression,
    ts: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def a: Expression = ts
  override def b: Expression = value
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deltaSumTimestamp"

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.sortBy(identity)
    var sum = 0.0
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i)._2 - sorted(i - 1)._2
      if (d > 0) sum += d
      i += 1
    }
    sum
  }

  override def withNewMutableAggBufferOffset(o: Int): DeltaSumTsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DeltaSumTsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DeltaSumTsAgg =
    copy(ts = c(0), value = c(1)) // children order is (a, b) = (ts, value)
}

/** deltaSum(v): sum of POSITIVE deltas between consecutive values in
  * arrival order — ClickHouse's counter-increase aggregate. The state
  * is (sum, first, last), exactly CH's AggregateFunctionDeltaSum:
  * update folds adjacent deltas within a partition, merge adds the
  * boundary delta between partial states — so a partition split
  * agrees with CH's own parallel execution, and the buffer is O(1)
  * regardless of group size (100 TB-safe). */
case class DeltaSumAgg(
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  // buffer layout: [seen (0/1), sum, first, last]
  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deltaSum"

  override def createAggregationBuffer(): Array[Double] =
    Array(0.0, 0.0, 0.0, 0.0)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v0 = value.eval(input)
    if (v0 != null) {
      val v = StatTests.asDouble(v0)
      if (buf(0) == 0.0) { buf(0) = 1.0; buf(2) = v; buf(3) = v }
      else {
        val d = v - buf(3)
        if (d > 0) buf(1) += d
        buf(3) = v
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b(0) == 0.0) a
    else if (a(0) == 0.0) b
    else {
      val boundary = b(2) - a(3)
      a(1) = a(1) + b(1) + (if (boundary > 0) boundary else 0.0)
      a(3) = b(3)
      a
    }
  }

  override def eval(buf: Array[Double]): Any = buf(1)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): DeltaSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DeltaSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DeltaSumAgg =
    copy(value = c(0))
}

/** analysisOfVariance(value, group): one-way ANOVA over the buffered
  * (group, value) pairs → (f_stat, p_value); the F survival rides the
  * same regularized incomplete beta the t-test uses. */
case class AnovaAgg(
    value: Expression,
    group: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def a: Expression = group
  override def b: Expression = value
  override def dataType: DataType = StructType(Seq(
    StructField("f_statistic", DoubleType),
    StructField("p_value", DoubleType)))
  override def prettyName: String = "analysisOfVariance"

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) return null
    val byGroup = buf.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = byGroup.size
    val n = buf.length
    if (k < 2 || n <= k) return null
    val grand = buf.iterator.map(_._2).sum / n
    var ssb = 0.0
    var ssw = 0.0
    byGroup.values.foreach { xs =>
      val m = xs.sum / xs.length
      ssb += xs.length * (m - grand) * (m - grand)
      xs.foreach { x => ssw += (x - m) * (x - m) }
    }
    val d1 = (k - 1).toDouble
    val d2 = (n - k).toDouble
    val f =
      if (ssw == 0.0) Double.PositiveInfinity
      else (ssb / d1) / (ssw / d2)
    val p =
      if (f.isInfinite) 0.0
      else StatTests.regIncBeta(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))
    org.apache.spark.sql.catalyst.InternalRow(f, p)
  }

  override def withNewMutableAggBufferOffset(o: Int): AnovaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AnovaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AnovaAgg =
    copy(group = c(0), value = c(1)) // children order is (a, b)
}

/** intervalLengthSum(start, end) → total length of the union of the
  * [start, end) intervals (overlaps counted once; empty/negative
  * intervals contribute nothing). */
case class IntervalLengthSumAgg(
    start: Expression,
    end: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def a: Expression = start
  override def b: Expression = end
  override def dataType: DataType = DoubleType
  override def prettyName: String = "intervalLengthSum"

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    val iv = buf.filter(p => p._2 > p._1).sortBy(identity)
    if (iv.isEmpty) return 0.0
    var total = 0.0
    var (curS, curE) = iv.head
    var i = 1
    while (i < iv.length) {
      val (s, e) = iv(i)
      if (s > curE) { total += curE - curS; curS = s; curE = e }
      else if (e > curE) curE = e
      i += 1
    }
    total + (curE - curS)
  }

  override def withNewMutableAggBufferOffset(o: Int): IntervalLengthSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntervalLengthSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): IntervalLengthSumAgg =
    copy(start = c(0), end = c(1))
}

/** maxIntersections(start, end) → the maximum number of [start, end)
  * intervals that cover a single point (an interval's end does not
  * intersect another's start: the −1 event sorts first at ties).
  * With `position = true` this is CH's maxIntersectionsPosition twin:
  * the (already-computed) left boundary at which that maximum is
  * FIRST reached, as an integer. */
case class MaxIntersectionsAgg(
    start: Expression,
    end: Expression,
    position: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def a: Expression = start
  override def b: Expression = end
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (position) "maxIntersectionsPosition" else "maxIntersections"

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) return 0L
    val events = new ArrayBuffer[(Double, Int)](buf.length * 2)
    buf.foreach { case (s, e) => events += ((s, 1)); events += ((e, -1)) }
    val sorted = events.sortBy(identity) // -1 before +1 at equal points
    var cur = 0L; var best = 0L; var at = 0.0
    sorted.foreach { case (p, d) =>
      cur += d
      if (cur > best) { best = cur; at = p }
    }
    if (position) math.round(at) else best
  }

  override def withNewMutableAggBufferOffset(o: Int): MaxIntersectionsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MaxIntersectionsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MaxIntersectionsAgg =
    copy(start = c(0), end = c(1))
}

/** Exponential time-decay family (exponentialMovingAverage /
  * exponentialTimeDecayedSum/Count/Avg/Max). Weights decay from the
  * GROUP'S LATEST time t_last: the EMA uses ClickHouse's base-2
  * half-life weights 2^(−(t_last−t)/x) normalized by their sum; the
  * TimeDecayed* variants use the documented e-base kernel
  * e^(−(t_last−t)/x). The buffer sorts by (t, value) at eval, so the
  * floating fold is identical for every partitioning and replays in
  * an oracle summing in the same order. */
case class ExpDecayAgg(
    x: Expression,
    value: Expression,
    ts: Expression,
    kind: ExpDecayAgg.Kind,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  import ExpDecayAgg._

  override def a: Expression = ts
  override def b: Expression = value
  override def children: Seq[Expression] = Seq(x, ts, value)
  override def dataType: DataType = DoubleType
  override def prettyName: String = kind match {
    case Ema => "exponentialMovingAverage"
    case Sum => "exponentialTimeDecayedSum"
    case Count => "exponentialTimeDecayedCount"
    case Avg => "exponentialTimeDecayedAvg"
    case Max => "exponentialTimeDecayedMax"
  }

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) return null
    val w = StatTests.asDouble(x.eval(null))
    val sorted = buf.sortBy(identity)
    val tLast = sorted.last._1
    kind match {
      case Ema =>
        var num = 0.0; var den = 0.0
        sorted.foreach { case (t, v) =>
          val k = math.pow(2.0, -(tLast - t) / w)
          num += v * k; den += k
        }
        num / den
      case Max =>
        var best = Double.NegativeInfinity
        sorted.foreach { case (t, v) =>
          val d = v * math.exp(-(tLast - t) / w)
          if (d > best) best = d
        }
        best
      case _ =>
        var sum = 0.0; var cnt = 0.0
        sorted.foreach { case (t, v) =>
          val k = math.exp(-(tLast - t) / w)
          sum += v * k; cnt += k
        }
        kind match {
          case Sum => sum
          case Count => cnt
          case _ => sum / cnt
        }
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): ExpDecayAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExpDecayAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ExpDecayAgg =
    copy(x = c(0), ts = c(1), value = c(2))
}

object ExpDecayAgg {
  sealed trait Kind
  case object Ema extends Kind
  case object Sum extends Kind
  case object Count extends Kind
  case object Avg extends Kind
  case object Max extends Kind
}

/** ClickHouse `sparkbar(width[, min_x, max_x])(x, y)` — the inline
  * unicode bar chart: bucket the x axis into `width` equal slots over
  * [min_x, max_x] (observed range when the bounds are omitted), sum
  * `y` per slot, render each slot as one of " ▁▂▃▄▅▆▇█" scaled by the
  * tallest slot. Buffers the group's (x, y) pairs like CH's own
  * implementation (the observed-range form needs min/max before
  * bucketing), so the group — never the table — must fit in memory. */
case class SparkBarAgg(
    width: Int,
    loHi: Option[(Double, Double)],
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  require(width >= 1 && width <= 1024,
    s"sparkbar width must be in [1, 1024], got $width")

  override def a: Expression = x
  override def b: Expression = y
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "sparkbar"

  private val glyphs = "▁▂▃▄▅▆▇█"

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty)
      return org.apache.spark.unsafe.types.UTF8String.fromString("")
    val lo = loHi.map(_._1).getOrElse(buf.iterator.map(_._1).min)
    val hi = loHi.map(_._2).getOrElse(buf.iterator.map(_._1).max)
    val span = hi - lo
    val sums = new Array[Double](width)
    buf.foreach { case (xv, yv) =>
      if (xv >= lo && xv <= hi) {
        val idx =
          if (span <= 0) 0
          else math.min(width - 1, ((xv - lo) / span * width).toInt)
        sums(idx) += yv
      }
    }
    val mx = sums.max
    val sb = new StringBuilder
    sums.foreach { s =>
      if (s <= 0 || mx <= 0) sb += ' '
      else {
        val level = math.min(8, math.max(1, math.ceil(s * 8.0 / mx).toInt))
        sb += glyphs.charAt(level - 1)
      }
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override def withNewMutableAggBufferOffset(o: Int): SparkBarAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SparkBarAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SparkBarAgg =
    copy(x = c(0), y = c(1)) // children order is (a, b) = (x, y)
}
