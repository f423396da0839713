package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ClickHouse's `largestTriangleThreeBuckets(n)(x, y)` (alias `lttb`):
  * downsample a series to `n` visually-representative points — the
  * dashboard shape of "render 10M points on an 800px chart".
  *
  * Algorithm (Steinarsson's LTTB): sort the series by (x, y); keep the
  * first and last points; split the m-2 middle points into n-2
  * contiguous buckets (point i of the middle goes to bucket
  * `i*(n-2)/(m-2)`, integer division); scanning left to right, pick
  * from each bucket the point forming the largest triangle with the
  * previously selected point and the NEXT bucket's average point (the
  * last middle bucket uses the series' final point). Areas compare by
  * `|（px-ax)(cy-py) - (px-cx)(ay-py)|` (2× the triangle area — same
  * argmax), ties to the earliest point, so selection is deterministic
  * and the DuckDB oracle replays it exactly (`q_lttb`).
  *
  * Like the reference aggregate this buffers the group's points (the
  * selection needs the full sorted series), so it is for SERIES-sized
  * groups — a rendered chart's data, not a raw 100 TB table. The cap
  * fails loudly at `MaxPoints`; pre-aggregate (e.g. to minutes) first,
  * which is what the reference docs prescribe too.
  */
case class LttbAgg(
    x: Expression,
    y: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  require(n >= 3, s"lttb requires n >= 3 output points, got $n")

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = x.dataType == DoubleType && y.dataType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lttb expects (x double, y double), got " +
        s"(${x.dataType.simpleString}, ${y.dataType.simpleString})")
  }

  // buffer stores x,y interleaved — flat doubles, no per-point boxing
  override def createAggregationBuffer(): ArrayBuffer[Double] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      require(buf.length < 2 * LttbAgg.MaxPoints,
        s"lttb buffers its group and this one exceeds ${LttbAgg.MaxPoints} " +
          "points; pre-aggregate the series to a coarser grain first")
      buf += xv.asInstanceOf[Double] += yv.asInstanceOf[Double]
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Double], other: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    require((buf.length + other.length) <= 2 * LttbAgg.MaxPoints,
      s"lttb buffers its group and this one exceeds ${LttbAgg.MaxPoints} " +
        "points; pre-aggregate the series to a coarser grain first")
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    val m = buf.length / 2
    val pts = Array.tabulate(m)(i => (buf(2 * i), buf(2 * i + 1)))
    java.util.Arrays.sort(pts, implicitly[Ordering[(Double, Double)]])
    val sel: Array[(Double, Double)] =
      if (m <= n) pts
      else {
        val out = new ArrayBuffer[(Double, Double)](n)
        out += pts(0)
        val mid = m - 2 // points 1..m-2, bucket of middle-index i = i*nb/mid
        val nb = n - 2
        var prev = pts(0)
        var b = 0
        var lo = 0 // middle-index of the current bucket's first point
        while (b < nb) {
          val hi = if (b == nb - 1) mid else middleBucketStart(b + 1, nb, mid)
          // next anchor: average of bucket b+1, or the final point
          var ax = 0.0
          var ay = 0.0
          if (b == nb - 1) {
            ax = pts(m - 1)._1
            ay = pts(m - 1)._2
          } else {
            val nhi = if (b == nb - 2) mid else middleBucketStart(b + 2, nb, mid)
            var j = hi
            while (j < nhi) { ax += pts(1 + j)._1; ay += pts(1 + j)._2; j += 1 }
            ax /= (nhi - hi)
            ay /= (nhi - hi)
          }
          var best = -1.0
          var bestP = prev
          var j = lo
          while (j < hi) {
            val (cx, cy) = pts(1 + j)
            val area = math.abs((prev._1 - ax) * (cy - prev._2) - (prev._1 - cx) * (ay - prev._2))
            if (area > best) { best = area; bestP = (cx, cy) }
            j += 1
          }
          out += bestP
          prev = bestP
          lo = hi
          b += 1
        }
        out += pts(m - 1)
        out.toArray
      }
    new GenericArrayData(sel.map(p => InternalRow(p._1, p._2)).toArray[Any])
  }

  /** First middle-index of bucket `b` under assignment i → i*nb/mid:
    * the smallest i with i*nb >= b*mid, i.e. ceil(b*mid/nb). */
  private def middleBucketStart(b: Int, nb: Int, mid: Int): Int =
    ((b.toLong * mid + nb - 1) / nb).toInt

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(4 + buf.length * 8)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt()
    val buf = new ArrayBuffer[Double](k)
    var i = 0
    while (i < k) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LttbAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LttbAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LttbAgg =
    copy(x = newChildren.head, y = newChildren(1))
}

object LttbAgg {
  /** Loud ceiling on buffered points per group (~128 MB of doubles). */
  val MaxPoints: Int = 8 * 1024 * 1024
}
