package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Two-sample statistical test aggregates under ClickHouse names
  * (reference dialect: studentTTest / welchTTest / mannWhitneyUTest /
  * rankCorr, each `agg(sample_value, sample_index)` with index 0/1).
  *
  * studentTTest/welchTTest keep only per-sample moments (n, mean, M2 —
  * Welford update, Chan parallel merge), so they partial-aggregate
  * map-side and merge in any order: the 100 TB shape. mannWhitneyUTest
  * and rankCorr need global ranks and buffer the group's samples —
  * the same memory contract as ClickHouse's own implementations (both
  * engines materialize the group in RAM; bound the group size, not the
  * table size).
  *
  * p-values: Student's t two-sided p via the regularized incomplete
  * beta function I_{df/(df+t²)}(df/2, ½) (continued-fraction
  * evaluation); Mann-Whitney's via the tie-corrected normal
  * approximation — the same approximation ClickHouse documents.
  */
object StatTests {

  /** ln Γ(x) — Lanczos series (g = 7, 9 coefficients), |ε| < 1e-13. */
  def lnGamma(xIn: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (xIn < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * xIn)) - lnGamma(1.0 - xIn)
    } else {
      val x = xIn - 1.0
      var a = g(0)
      val t = x + 7.5
      var i = 1
      while (i < 9) { a += g(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) by Lentz's continued
    * fraction, with the symmetry flip for fast convergence. */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    if (x > (a + 1.0) / (a + b + 2.0)) return 1.0 - regIncBeta(b, a, 1.0 - x)
    val lnFront = a * math.log(x) + b * math.log(1.0 - x) -
      (lnGamma(a) + lnGamma(b) - lnGamma(a + b))
    val tiny = 1e-300
    var f = 1.0; var c = 1.0; var d = 0.0
    var m = 0
    while (m < 300) {
      val numer: Double =
        if (m == 0) 1.0
        else if (m % 2 == 0) {
          val k = m / 2
          k * (b - k) * x / ((a + 2.0 * k - 1.0) * (a + 2.0 * k))
        } else {
          val k = (m - 1) / 2
          -(a + k) * (a + b + k) * x / ((a + 2.0 * k) * (a + 2.0 * k + 1.0))
        }
      d = 1.0 + numer * d
      if (math.abs(d) < tiny) d = tiny
      d = 1.0 / d
      c = 1.0 + numer / c
      if (math.abs(c) < tiny) c = tiny
      val delta = c * d
      f *= delta
      if (math.abs(delta - 1.0) < 1e-15) {
        return math.exp(lnFront) * (f - 1.0) / a
      }
      m += 1
    }
    math.exp(lnFront) * (f - 1.0) / a
  }

  /** Two-sided Student's t p-value with `df` degrees of freedom. */
  def tTwoSidedP(t: Double, df: Double): Double =
    if (df <= 0 || t.isNaN) Double.NaN
    else regIncBeta(df / 2.0, 0.5, df / (df + t * t))

  /** erfc via Abramowitz-Stegun 7.1.26 (|ε| < 1.5e-7). */
  def erfc(xIn: Double): Double = {
    val x = math.abs(xIn)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
      t * (-1.453152027 + t * 1.061405429))))
    val r = poly * math.exp(-x * x)
    if (xIn >= 0) r else 2.0 - r
  }

  /** Two-sided normal p-value for a z score. */
  def zTwoSidedP(z: Double): Double = erfc(math.abs(z) / math.sqrt(2.0))

  /** One-sided normal survival p = P(Z ≥ z). */
  def zUpperP(z: Double): Double = 0.5 * erfc(z / math.sqrt(2.0))

  /** Critical t with two-sided P(|T| ≤ t) = conf at `df` degrees of
    * freedom — bisection on the monotone two-sided p (eval-time only,
    * once per group; 200 halvings reach machine precision). */
  def tCritTwoSided(conf: Double, df: Double): Double = {
    val target = 1.0 - conf
    if (target <= 0.0 || df <= 0) return Double.NaN
    var hi = 1.0
    while (tTwoSidedP(hi, df) > target && hi < 1e9) hi *= 2
    var lo = 0.0
    var i = 0
    while (i < 200) {
      val mid = 0.5 * (lo + hi)
      if (tTwoSidedP(mid, df) > target) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** Exact two-sample KS p-value by the normalized lattice path count
    * (Hodges 1958): of the C(n0+n1, n0) orderings, the share whose
    * partial CDFs stay strictly inside the band never reaches D ≥ d.
    * u(i,j) = u(i−1,j)·i/(i+j) + u(i,j−1)·j/(i+j) keeps every entry a
    * probability in [0,1] — no overflow at any sample size. O(n0·n1)
    * time, O(n1) memory (rolling row). Valid for continuous data
    * (no ties) — callers fall back to the asymptotic p on ties, the
    * same rule SciPy applies. */
  def ksExactP(n0: Int, n1: Int, d: Double, alternative: String): Double = {
    if (d <= 0.0) return 1.0
    val inv0 = 1.0 / n0
    val inv1 = 1.0 / n1
    val eps = 1e-12
    def inside(i: Int, j: Int): Boolean = {
      val diff = i * inv0 - j * inv1
      alternative match {
        case "greater" => diff < d - eps
        case "less" => -diff < d - eps
        case _ => math.abs(diff) < d - eps
      }
    }
    val u = new Array[Double](n1 + 1)
    u(0) = 1.0
    var j = 1
    while (j <= n1) { u(j) = if (inside(0, j)) u(j - 1) else 0.0; j += 1 }
    var i = 1
    while (i <= n0) {
      u(0) = if (inside(i, 0)) u(0) else 0.0
      j = 1
      while (j <= n1) {
        u(j) =
          if (!inside(i, j)) 0.0
          else u(j) * (i.toDouble / (i + j)) + u(j - 1) * (j.toDouble / (i + j))
        j += 1
      }
      i += 1
    }
    math.min(1.0, math.max(0.0, 1.0 - u(n1)))
  }

  /** Critical z with P(|Z| ≤ z) = conf: Newton's method on
    * erfc(z/√2) = 1 − conf (monotone, derivative −√(2/π)·e^{−z²/2});
    * converges to machine precision in < 10 steps from z₀ = 1. */
  def probitTwoSided(conf: Double): Double = {
    val target = 1.0 - conf
    var z = 1.0
    var i = 0
    while (i < 60) {
      val f = erfc(z / math.sqrt(2.0)) - target
      val fp = -math.sqrt(2.0 / math.Pi) * math.exp(-z * z / 2.0)
      val step = f / fp
      z -= step
      if (math.abs(step) < 1e-14) i = 60 else i += 1
    }
    z
  }

  val ttestResultType: StructType = StructType(Seq(
    StructField("t_stat", DoubleType), StructField("p_value", DoubleType)))

  val ksResultType: StructType = StructType(Seq(
    StructField("d_stat", DoubleType), StructField("p_value", DoubleType)))

  /** Kolmogorov asymptotic survival function
    * Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}. */
  def kolmogorovQ(lambda: Double): Double = {
    if (lambda <= 0) return 1.0
    var sum = 0.0
    var sign = 1.0
    var k = 1
    while (k <= 100) {
      val term = sign * math.exp(-2.0 * k * k * lambda * lambda)
      sum += term
      if (math.abs(term) < 1e-16) return math.min(1.0, 2.0 * sum)
      sign = -sign
      k += 1
    }
    math.min(1.0, 2.0 * sum)
  }

  val mwResultType: StructType = StructType(Seq(
    StructField("u_stat", DoubleType), StructField("z_score", DoubleType),
    StructField("p_value", DoubleType)))

  private[functions] def asDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case dec: Decimal => dec.toDouble
    case other => other.toString.toDouble
  }

  private[functions] def asIdx(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case b: Boolean => if (b) 1 else 0
    case other => other.toString.toDouble.toInt
  }

  /** Average ranks (ties share the mean rank — half-integers, exact
    * in doubles) for an UNSORTED value array; also returns Σ(t³-t)
    * over tie groups for the Mann-Whitney variance correction. */
  private[functions] def avgRanks(values: Array[Double]): (Array[Double], Double) = {
    val n = values.length
    val order = Array.range(0, n).sortBy(values(_))
    val ranks = new Array[Double](n)
    var tieSum = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && values(order(j + 1)) == values(order(i))) j += 1
      val t = j - i + 1
      val avg = (i + 1 + j + 1) / 2.0
      var k = i
      while (k <= j) { ranks(order(k)) = avg; k += 1 }
      tieSum += t.toDouble * t * t - t
      i = j + 1
    }
    (ranks, tieSum)
  }
}

/** Per-sample Welford moments: (n, mean, M2) × two samples. */
final class MomentsBuffer {
  val n = new Array[Long](2)
  val mean = new Array[Double](2)
  val m2 = new Array[Double](2)

  def add(idx: Int, x: Double): Unit = {
    val i = idx & 1
    n(i) += 1
    val d = x - mean(i)
    mean(i) += d / n(i)
    m2(i) += d * (x - mean(i))
  }

  /** Chan et al. parallel merge — order-insensitive to ulp noise only. */
  def merge(o: MomentsBuffer): Unit = {
    var i = 0
    while (i < 2) {
      if (o.n(i) > 0) {
        if (n(i) == 0) { n(i) = o.n(i); mean(i) = o.mean(i); m2(i) = o.m2(i) }
        else {
          val nA = n(i).toDouble; val nB = o.n(i).toDouble
          val d = o.mean(i) - mean(i)
          val nT = nA + nB
          m2(i) += o.m2(i) + d * d * nA * nB / nT
          mean(i) += d * nB / nT
          n(i) += o.n(i)
        }
      }
      i += 1
    }
  }
}

/** studentTTest / welchTTest (value, sample_index) → struct(t_stat,
  * p_value). Pooled-variance t when `welch` is false; Welch's t and
  * Welch-Satterthwaite df when true. The ClickHouse parametric form
  * `studentTTest(confidence_level)(value, index)` adds the confidence
  * interval on the mean difference — (m0 − m1) ± t_crit(df, conf)·se
  * with the same se/df the statistic uses — as two extra struct
  * fields, matching CH's 4-tuple. */
case class TTestAgg(
    value: Expression,
    idx: Expression,
    welch: Boolean,
    confidence: Option[Double] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuffer] {

  override def children: Seq[Expression] = Seq(value, idx)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (confidence.isEmpty) StatTests.ttestResultType
    else StructType(Seq(
      StructField("t_stat", DoubleType), StructField("p_value", DoubleType),
      StructField("ci_low", DoubleType), StructField("ci_high", DoubleType)))
  override def prettyName: String = if (welch) "welchTTest" else "studentTTest"

  override def createAggregationBuffer(): MomentsBuffer = new MomentsBuffer

  override def update(buf: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val v = value.eval(input)
    val g = idx.eval(input)
    if (v != null && g != null)
      buf.add(StatTests.asIdx(g), StatTests.asDouble(v))
    buf
  }

  override def merge(buf: MomentsBuffer, other: MomentsBuffer): MomentsBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MomentsBuffer): Any = {
    val n0 = buf.n(0).toDouble; val n1 = buf.n(1).toDouble
    if (buf.n(0) < 2 || buf.n(1) < 2) return null
    val v0 = buf.m2(0) / (n0 - 1.0); val v1 = buf.m2(1) / (n1 - 1.0)
    val md = buf.mean(0) - buf.mean(1)
    val (t, df, se) =
      if (welch) {
        val se0 = v0 / n0; val se1 = v1 / n1
        val s = math.sqrt(se0 + se1)
        val dd = (se0 + se1) * (se0 + se1) /
          (se0 * se0 / (n0 - 1.0) + se1 * se1 / (n1 - 1.0))
        (md / s, dd, s)
      } else {
        val sp2 = ((n0 - 1.0) * v0 + (n1 - 1.0) * v1) / (n0 + n1 - 2.0)
        val s = math.sqrt(sp2 * (1.0 / n0 + 1.0 / n1))
        (md / s, n0 + n1 - 2.0, s)
      }
    val p = StatTests.tTwoSidedP(t, df)
    confidence match {
      case None => new GenericInternalRow(Array[Any](t, p))
      case Some(conf) =>
        val half = StatTests.tCritTwoSided(conf, df) * se
        new GenericInternalRow(Array[Any](t, p, md - half, md + half))
    }
  }

  override def serialize(buf: MomentsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(48)
    val out = new java.io.DataOutputStream(bos)
    var i = 0
    while (i < 2) {
      out.writeLong(buf.n(i)); out.writeDouble(buf.mean(i))
      out.writeDouble(buf.m2(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MomentsBuffer
    var i = 0
    while (i < 2) {
      b.n(i) = in.readLong(); b.mean(i) = in.readDouble()
      b.m2(i) = in.readDouble(); i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TTestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TTestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TTestAgg =
    copy(value = c(0), idx = c(1))
}

object TTestAgg {
  /** The parametric spelling `f(confidence_level)(value, index)` —
    * shim-flattened params-first. The level must be a constant in
    * (0, 1); anything else is a scoped analysis error, never a value
    * silently aggregated. */
  def withConfidence(
      conf: Expression, value: Expression, idx: Expression,
      welch: Boolean): TTestAgg = {
    val name = if (welch) "welchTTest" else "studentTTest"
    val c = conf match {
      case e if e.foldable =>
        try StatTests.asDouble(e.eval()) catch {
          case _: Exception => throw new IllegalArgumentException(
            s"$name confidence level must be a constant number in (0, 1), got $e")
        }
      case other => throw new IllegalArgumentException(
        s"$name confidence level must be a constant, got $other")
    }
    require(c > 0.0 && c < 1.0,
      s"$name confidence level must be in (0, 1), got $c")
    TTestAgg(value, idx, welch, confidence = Some(c))
  }
}

/** mannWhitneyUTest(value, sample_index) → struct(u_stat, z_score,
  * p_value). U is the first sample's statistic (rank-sum form with
  * average ranks for ties); z and p use the tie-corrected normal
  * approximation. BOTH the plain form and the parametric form
  * `mannWhitneyUTest(alternative[, continuity])(v, g)` apply the
  * ±0.5 continuity correction by default — ClickHouse documents
  * continuity_correction=1 as the default for every spelling, so the
  * same pasted query answers the same p whether or not the defaults
  * are spelled out. The one-sided alternatives dispatch 'greater'
  * (sample 0 shifted right) and 'less' (shifted left). The z replay
  * in plain SQL stays bit-exact: u, mu and the ±0.5 term are exact
  * half-integers, so the oracle spells the same signed correction.
  * Buffers the group's samples (class doc). */
case class MannWhitneyAgg(
    value: Expression,
    idx: Expression,
    alternative: String = "two-sided",
    continuity: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Byte)]] {

  override def children: Seq[Expression] = Seq(value, idx)
  override def nullable: Boolean = true
  override def dataType: DataType = StatTests.mwResultType
  override def prettyName: String = "mannWhitneyUTest"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Byte)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, Byte)],
      input: InternalRow): ArrayBuffer[(Double, Byte)] = {
    val v = value.eval(input)
    val g = idx.eval(input)
    if (v != null && g != null)
      buf += ((StatTests.asDouble(v), (StatTests.asIdx(g) & 1).toByte))
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Byte)],
      other: ArrayBuffer[(Double, Byte)]): ArrayBuffer[(Double, Byte)] = {
    buf ++= other; buf
  }

  override def eval(buf: ArrayBuffer[(Double, Byte)]): Any = {
    val n = buf.length
    val n0 = buf.count(_._2 == 0).toDouble
    val n1 = n - n0
    if (n0 < 1 || n1 < 1) return null
    val values = new Array[Double](n)
    var i = 0
    while (i < n) { values(i) = buf(i)._1; i += 1 }
    val (ranks, tieSum) = StatTests.avgRanks(values)
    var r0 = 0.0
    i = 0
    while (i < n) { if (buf(i)._2 == 0) r0 += ranks(i); i += 1 }
    val u = r0 - n0 * (n0 + 1.0) / 2.0
    val mu = n0 * n1 / 2.0
    val nd = n.toDouble
    val sigma = math.sqrt(
      n0 * n1 / 12.0 * ((nd + 1.0) - tieSum / (nd * (nd - 1.0))))
    val (z, p) = alternative match {
      case "greater" =>
        val zz = (u - mu - (if (continuity) 0.5 else 0.0)) / sigma
        (zz, StatTests.zUpperP(zz))
      case "less" =>
        val zz = (u - mu + (if (continuity) 0.5 else 0.0)) / sigma
        (zz, 1.0 - StatTests.zUpperP(zz))
      case _ =>
        val cc = if (continuity) 0.5 * math.signum(u - mu) else 0.0
        val zz = (u - mu - cc) / sigma
        (zz, StatTests.zTwoSidedP(zz))
    }
    new GenericInternalRow(Array[Any](u, z, p))
  }

  override def serialize(buf: ArrayBuffer[(Double, Byte)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 + buf.length * 9)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, g) => out.writeDouble(v); out.writeByte(g.toInt) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Byte)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new ArrayBuffer[(Double, Byte)](n)
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readByte())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MannWhitneyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MannWhitneyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MannWhitneyAgg =
    copy(value = c(0), idx = c(1))
}

/** rankCorr(x, y) → Spearman's ρ: Pearson correlation of the two
  * columns' average ranks, computed from exact rank power sums (ranks
  * are half-integers; every sum stays exact in doubles far past any
  * realistic group size). Buffers the group's pairs (see class doc). */
case class RankCorrAgg(
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]] {

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rankCorr"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null)
      buf += ((StatTests.asDouble(xv), StatTests.asDouble(yv)))
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    buf ++= other; buf
  }

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    val n = buf.length
    if (n < 2) return null
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = buf(i)._1; ys(i) = buf(i)._2; i += 1 }
    val (rx, _) = StatTests.avgRanks(xs)
    val (ry, _) = StatTests.avgRanks(ys)
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    i = 0
    while (i < n) {
      sx += rx(i); sy += ry(i)
      sxx += rx(i) * rx(i); syy += ry(i) * ry(i); sxy += rx(i) * ry(i)
      i += 1
    }
    val nd = n.toDouble
    val den = math.sqrt(nd * sxx - sx * sx) * math.sqrt(nd * syy - sy * sy)
    if (den == 0.0) return null
    (nd * sxy - sx * sy) / den
  }

  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 + buf.length * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (a, b) => out.writeDouble(a); out.writeDouble(b) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new ArrayBuffer[(Double, Double)](n)
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readDouble())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): RankCorrAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RankCorrAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): RankCorrAgg =
    copy(x = c(0), y = c(1))
}

/** kolmogorovSmirnovTest(value, sample_index) → struct(d_stat,
  * p_value). D is the exact sup-distance between the two empirical
  * CDFs (rational counts — deterministic and replayable in plain
  * SQL); p uses the asymptotic Kolmogorov distribution with the
  * standard finite-sample λ adjustment. The ClickHouse parametric
  * form `kolmogorovSmirnovTest([alternative][, method])(v, g)` adds
  * the one-sided statistics (D⁺ = sup(F0−F1) for 'greater', D⁻ for
  * 'less'; one-sided asymptotic p = e^(−2·n_e·d²)) and the exact
  * p-value (Hodges path count, see [[StatTests.ksExactP]]); 'auto'
  * picks exact when max(n0, n1) < 10000, the CH rule.
  *
  * Result contract for method='exact': the exact path SILENTLY
  * downgrades to the asymptotic p in two cases — (a) ties exist
  * (the path count is invalid for continuous-data inference;
  * SciPy's rule), or (b) n0·n1 > 10⁷ (the Hodges DP is O(n0·n1)
  * time per group evaluation, so the cap bounds a single eval at
  * ~tens of ms instead of the multi-second stall the old 10⁸ cap
  * allowed). d_stat is unaffected; only which p formula answered
  * is unobservable from the result — callers needing certainty
  * should keep max(n0, n1) below a few thousand. Buffers the
  * group's samples (see StatTests doc). */
case class KolmogorovSmirnovAgg(
    value: Expression,
    idx: Expression,
    alternative: String = "two-sided",
    method: String = "asymp",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Byte)]] {

  override def children: Seq[Expression] = Seq(value, idx)
  override def nullable: Boolean = true
  override def dataType: DataType = StatTests.ksResultType
  override def prettyName: String = "kolmogorovSmirnovTest"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Byte)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, Byte)],
      input: InternalRow): ArrayBuffer[(Double, Byte)] = {
    val v = value.eval(input)
    val g = idx.eval(input)
    if (v != null && g != null)
      buf += ((StatTests.asDouble(v), (StatTests.asIdx(g) & 1).toByte))
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Byte)],
      other: ArrayBuffer[(Double, Byte)]): ArrayBuffer[(Double, Byte)] = {
    buf ++= other; buf
  }

  override def eval(buf: ArrayBuffer[(Double, Byte)]): Any = {
    val n0 = buf.count(_._2 == 0)
    val n1 = buf.length - n0
    if (n0 < 1 || n1 < 1) return null
    val sorted = buf.sortBy(_._1)
    var c0 = 0L; var c1 = 0L
    var d = 0.0
    var ties = false
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)._1
      // absorb ALL ties at v before reading the CDF gap
      var dup = 0
      while (i < sorted.length && sorted(i)._1 == v) {
        if (sorted(i)._2 == 0) c0 += 1 else c1 += 1
        dup += 1
        i += 1
      }
      if (dup > 1) ties = true
      val diff = c0.toDouble / n0 - c1.toDouble / n1
      val gap = alternative match {
        case "greater" => diff
        case "less" => -diff
        case _ => math.abs(diff)
      }
      if (gap > d) d = gap
    }
    val ne = n0.toDouble * n1 / (n0.toDouble + n1)
    val en = math.sqrt(ne)
    def asympP: Double = alternative match {
      case "two-sided" => StatTests.kolmogorovQ((en + 0.12 + 0.11 / en) * d)
      case _ => math.min(1.0, math.exp(-2.0 * ne * d * d))
    }
    // n0·n1 cap bounds the O(n0·n1) Hodges DP — see the class doc's
    // result contract for the silent exact→asymptotic downgrade
    val exactEligible = !ties && n0.toLong * n1 <= 10000000L
    val useExact = method match {
      case "exact" => exactEligible
      case "auto" => exactEligible && math.max(n0, n1) < 10000
      case _ => false
    }
    val p = if (useExact) StatTests.ksExactP(n0, n1, d, alternative) else asympP
    new GenericInternalRow(Array[Any](d, p))
  }

  override def serialize(buf: ArrayBuffer[(Double, Byte)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 + buf.length * 9)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, g) => out.writeDouble(v); out.writeByte(g.toInt) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Byte)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new ArrayBuffer[(Double, Byte)](n)
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readByte())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KolmogorovSmirnovAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KolmogorovSmirnovAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KolmogorovSmirnovAgg =
    copy(value = c(0), idx = c(1))
}
