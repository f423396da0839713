package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** seriesOutliersDetectTukey(series[, k]) — per-element anomaly scores
  * by Tukey fences: q1/q3 are the R-7 (linear-interpolation) quartiles
  * of the series, the fences sit k·IQR beyond them (k = 1.5 default),
  * and each element's score is its signed distance past the fence —
  * 0 inside. On integer series every quartile is dyadic-exact, so the
  * scores replay bit-for-bit in any engine with the same interpolation
  * rule. */
case class TukeyOutliers(series: Expression, kFence: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = series
  override def right: Expression = kFence
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "seriesOutliersDetectTukey"

  override def nullSafeEval(a: Any, kf: Any): Any =
    TukeyOutliers.compute(a.asInstanceOf[ArrayData], kf.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, kf) =>
      s"graft.functions.TukeyOutliers.compute($a, $kf)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TukeyOutliers =
    copy(series = l, kFence = r)
}

object TukeyOutliers {

  /** R-7 quantile of a sorted array. */
  private def q(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 >= sorted.length) sorted(sorted.length - 1)
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  def compute(arr: ArrayData, k: Double): GenericArrayData = {
    val n = arr.numElements()
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      vals(i) = if (arr.isNullAt(i)) Double.NaN else arr.getDouble(i)
      i += 1
    }
    val clean = vals.filterNot(_.isNaN)
    if (clean.length < 4)
      return new GenericArrayData(Array.fill[Any](n)(0.0))
    val sorted = clean.sorted
    val q1 = q(sorted, 0.25)
    val q3 = q(sorted, 0.75)
    val iqr = q3 - q1
    val lo = q1 - k * iqr
    val hi = q3 + k * iqr
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val v = vals(i)
      out(i) =
        if (v.isNaN) null
        else if (v < lo) v - lo
        else if (v > hi) v - hi
        else 0.0
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** seriesPeriodDetectFFT(series) — the dominant period of the
  * mean-removed series by discrete-Fourier periodogram (naive O(n²)
  * DFT — the series is one group's array, not the table). Returns
  * n / argmax_k |X_k|² over k = 1..n/2 as a double; 0 when the series
  * is too short or constant. */
case class FftPeriod(series: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = series
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "seriesPeriodDetectFFT"

  override def nullSafeEval(a: Any): Any =
    FftPeriod.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.FftPeriod.compute($a)")

  override protected def withNewChildInternal(c: Expression): FftPeriod =
    copy(series = c)
}

object FftPeriod {
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n < 4) return 0.0
    val x = new Array[Double](n)
    var mean = 0.0
    var i = 0
    while (i < n) {
      x(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i)
      mean += x(i)
      i += 1
    }
    mean /= n
    i = 0
    var variance = 0.0
    while (i < n) { x(i) -= mean; variance += x(i) * x(i); i += 1 }
    if (variance == 0.0) return 0.0
    var bestK = 0
    var bestP = 0.0
    var kk = 1
    while (kk <= n / 2) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val ang = 2.0 * math.Pi * kk * t / n
        re += x(t) * math.cos(ang)
        im -= x(t) * math.sin(ang)
        t += 1
      }
      val p = re * re + im * im
      if (p > bestP) { bestP = p; bestK = kk }
      kk += 1
    }
    if (bestK == 0) 0.0 else n.toDouble / bestK
  }
}
