package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** linearRegression(target, f1, ..., fk) → array [w1..wk, bias]:
  * multi-feature least squares via the NORMAL EQUATIONS. The partial
  * state is (XᵀX, Xᵀy) — (k+1)² + (k+1) doubles — which adds under
  * merge, so training distributes as one map-side-combined pass over
  * any number of rows: the 100 TB shape (ClickHouse's
  * stochasticLinearRegression streams SGD through the same
  * aggregate-state machinery; OLS gives the exact argmin of the same
  * loss, deterministically). The dense solve happens once at eval on
  * the (k+1)-sized system via Gaussian elimination with partial
  * pivoting. Singular systems return null. */
case class LinRegAgg(
    target: Expression,
    features: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val k = features.size
  private val d = k + 1 // + intercept

  override def children: Seq[Expression] = target +: features
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "linearRegression"

  // layout: [ XtX (d*d row-major) | Xty (d) | n ]
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](d * d + d + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val y = target.eval(input)
    if (y == null) return buf
    val x = new Array[Double](d)
    var i = 0
    while (i < k) {
      val v = features(i).eval(input)
      if (v == null) return buf
      x(i) = StatTests.asDouble(v)
      i += 1
    }
    x(k) = 1.0
    val yd = StatTests.asDouble(y)
    var r = 0
    while (r < d) {
      var c = 0
      while (c < d) { buf(r * d + c) += x(r) * x(c); c += 1 }
      buf(d * d + r) += x(r) * yd
      r += 1
    }
    buf(d * d + d) += 1.0
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf(d * d + d) < 1.0) return null
    // dense copy for the in-place solve
    val a = new Array[Double](d * d)
    System.arraycopy(buf, 0, a, 0, d * d)
    val b = new Array[Double](d)
    System.arraycopy(buf, d * d, b, 0, d)
    var col = 0
    while (col < d) {
      var piv = col
      var r = col + 1
      while (r < d) {
        if (math.abs(a(r * d + col)) > math.abs(a(piv * d + col))) piv = r
        r += 1
      }
      if (a(piv * d + col) == 0.0) return null // singular
      if (piv != col) {
        var c = 0
        while (c < d) {
          val t = a(col * d + c); a(col * d + c) = a(piv * d + c)
          a(piv * d + c) = t; c += 1
        }
        val t = b(col); b(col) = b(piv); b(piv) = t
      }
      r = col + 1
      while (r < d) {
        val f = a(r * d + col) / a(col * d + col)
        var c = col
        while (c < d) { a(r * d + c) -= f * a(col * d + c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val w = new Array[Double](d)
    var r = d - 1
    while (r >= 0) {
      var s = b(r)
      var c = r + 1
      while (c < d) { s -= a(r * d + c) * w(c); c += 1 }
      w(r) = s / a(r * d + r)
      r -= 1
    }
    new GenericArrayData(w)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): LinRegAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LinRegAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): LinRegAgg =
    copy(target = c.head, features = c.tail)
}
