package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** ClickHouse `histogram(N)(x)` — the adaptive streaming histogram
  * (public algorithm: Ben-Haim & Tom-Tov, "A Streaming Parallel
  * Decision Tree Algorithm", JMLR 2010), returning an array of
  * `(lower, upper, height)` bins like CH's
  * AggregateFunctionHistogram. The state is at most `bins` weighted
  * centroids plus the running min/max — O(N) per group regardless of
  * input size, and `merge` is the same compress-after-concatenate the
  * paper defines, so partial aggregation is exact-shape-preserving and
  * 100 TB-safe.
  *
  * Determinism note (same contract as CH): the compression greedily
  * merges the closest centroid pair, so bin EDGES can vary slightly
  * with input order; totals (Σ height = row count) and the value range
  * are order-independent, which is what the spec pins.
  */
case class HistogramAgg(
    child: Expression,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistogramAgg.State] {

  require(bins >= 1 && bins <= 250,
    s"histogram bin count must be in [1, 250], got $bins")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "histogram"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false),
    StructField("height", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): HistogramAgg.State =
    new HistogramAgg.State(bins)

  override def update(st: HistogramAgg.State, input: InternalRow)
      : HistogramAgg.State = {
    val v = child.eval(input)
    if (v != null) st.add(StatTests.asDouble(v), 1.0)
    st
  }

  override def merge(st: HistogramAgg.State, other: HistogramAgg.State)
      : HistogramAgg.State = { st.mergeIn(other); st }

  override def eval(st: HistogramAgg.State): Any = {
    val cs = st.sorted
    if (cs.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cs.length)
    var i = 0
    while (i < cs.length) {
      val lower = if (i == 0) st.min else (cs(i - 1)._1 + cs(i)._1) / 2.0
      val upper =
        if (i == cs.length - 1) st.max else (cs(i)._1 + cs(i + 1)._1) / 2.0
      out(i) = new GenericInternalRow(Array[Any](lower, upper, cs(i)._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(st: HistogramAgg.State): Array[Byte] = st.toBytes
  override def deserialize(bytes: Array[Byte]): HistogramAgg.State =
    HistogramAgg.State.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HistogramAgg = copy(child = c(0))
}

object HistogramAgg {

  /** Mutable centroid set: parallel (mean, weight) arrays kept sorted
    * by mean, capped at `cap` by merging the closest adjacent pair —
    * the paper's `update` and `merge` procedures verbatim. */
  final class State(val cap: Int) {
    private var means = new Array[Double](cap + 1)
    private var weights = new Array[Double](cap + 1)
    private var n = 0
    var min: Double = Double.PositiveInfinity
    var max: Double = Double.NegativeInfinity

    def size: Int = n
    def sorted: IndexedSeq[(Double, Double)] =
      (0 until n).map(i => (means(i), weights(i)))

    def add(x: Double, w: Double): Unit = {
      if (x < min) min = x
      if (x > max) max = x
      // binary search for the insertion point
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (means(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < n && means(lo) == x) { weights(lo) += w; return }
      System.arraycopy(means, lo, means, lo + 1, n - lo)
      System.arraycopy(weights, lo, weights, lo + 1, n - lo)
      means(lo) = x
      weights(lo) = w
      n += 1
      if (n > cap) compressOnce()
    }

    /** Merge the adjacent pair with the smallest mean gap (ties: the
      * leftmost, so the result is input-deterministic). */
    private def compressOnce(): Unit = {
      var best = 0
      var bestGap = Double.PositiveInfinity
      var i = 0
      while (i < n - 1) {
        val gap = means(i + 1) - means(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val w = weights(best) + weights(best + 1)
      means(best) =
        (means(best) * weights(best) + means(best + 1) * weights(best + 1)) / w
      weights(best) = w
      System.arraycopy(means, best + 2, means, best + 1, n - best - 2)
      System.arraycopy(weights, best + 2, weights, best + 1, n - best - 2)
      n -= 1
    }

    def mergeIn(other: State): Unit = {
      var i = 0
      while (i < other.size) {
        add(other.means(i), other.weights(i))
        i += 1
      }
      if (other.min < min) min = other.min
      if (other.max > max) max = other.max
    }

    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(24 + n * 16)
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(cap)
      out.writeInt(n)
      out.writeDouble(min)
      out.writeDouble(max)
      var i = 0
      while (i < n) {
        out.writeDouble(means(i)); out.writeDouble(weights(i)); i += 1
      }
      out.flush(); bos.toByteArray
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte]): State = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val st = new State(in.readInt())
      val n = in.readInt()
      val mn = in.readDouble()
      val mx = in.readDouble()
      var i = 0
      // the state was already ≤ cap, so re-adding never compresses
      while (i < n) { st.add(in.readDouble(), in.readDouble()); i += 1 }
      // the true value range is wider than the centroid means (means
      // are averages) — restore it AFTER the adds
      st.min = mn
      st.max = mx
      st
    }
  }
}
