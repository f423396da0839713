package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable

/** quantileExactWeighted(x, weight, level) — ClickHouse's exact
  * weighted quantile. The partial state is the VALUE HISTOGRAM
  * (value → total weight), so duplicated values collapse map-side and
  * merges commute; eval sorts the histogram once and returns the first
  * value whose cumulative weight reaches level × total. With integer
  * weights the crossing test is exact IEEE arithmetic on integers, so
  * any engine replaying `cum ≥ level · total` agrees bit-for-bit. */
case class QuantileExactWeightedAgg(
    x: Expression,
    weight: Expression,
    level: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]] {

  override def children: Seq[Expression] = Seq(x, weight, level)
  override def nullable: Boolean = true
  // an ARRAY level literal selects the plural spelling
  // (quantilesExactWeighted(p1, p2)(x, w)) -> array result
  override def dataType: DataType =
    if (level.dataType.isInstanceOf[ArrayType]) ArrayType(DoubleType)
    else DoubleType
  override def prettyName: String = "quantileExactWeighted"

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Double, Long],
      input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = x.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val k = StatTests.asDouble(v)
      buf.update(k, buf.getOrElse(k, 0L) + StatTests.asDouble(w).toLong)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Double, Long],
      other: mutable.HashMap[Double, Long]): mutable.HashMap[Double, Long] = {
    other.foreach { case (k, w) => buf.update(k, buf.getOrElse(k, 0L) + w) }
    buf
  }

  override def eval(buf: mutable.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.toIndexedSeq.sortBy(_._1)
    var total = 0L
    sorted.foreach(total += _._2)
    def at(q: Double): Double = {
      val threshold = q * total
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= threshold) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    level.eval(null) match {
      case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ad.toDoubleArray().map(at))
      case q => at(StatTests.asDouble(q))
    }
  }

  override def serialize(buf: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(4 + buf.size * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, w) => out.writeDouble(k); out.writeLong(w) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Double, Long]
    var i = 0
    while (i < n) { buf.update(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileExactWeightedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileExactWeightedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileExactWeightedAgg =
    copy(x = c(0), weight = c(1), level = c(2))
}

/** sumKahan — compensated summation in the Neumaier (Kahan–Babuška)
  * variant: the state is (sum, compensation), 16 bytes; the
  * compensation track absorbs the rounding error of EVERY add in
  * either magnitude order (classic Kahan drops its compensation when
  * a large opposite-sign term cancels the running sum), and merges
  * compensated-add the other sum while compensations add linearly.
  * The result is within 2ε of the true rational sum REGARDLESS of
  * merge order, which is what makes a rounded money sum safe where the
  * naive double sum's partial-aggregation-order drift is not (the
  * q_ch_convert hazard class). */
case class SumKahanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sumKahan"

  // (sum, compensation, seen)
  override def createAggregationBuffer(): Array[Double] = new Array[Double](3)

  private def add(buf: Array[Double], v: Double): Unit = {
    val t = buf(0) + v
    buf(1) +=
      (if (math.abs(buf(0)) >= math.abs(v)) (buf(0) - t) + v
       else (v - t) + buf(0))
    buf(0) = t
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) { add(buf, StatTests.asDouble(v)); buf(2) = 1.0 }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other(2) != 0.0) {
      add(buf, other(0))
      buf(1) += other(1)
      buf(2) = 1.0
    }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(2) == 0.0) null else buf(0) + buf(1)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(3)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): SumKahanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SumKahanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SumKahanAgg =
    copy(child = c(0))
}
