package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types._

/** Mergeable quantile sketches — ClickHouse's `quantileState` /
  * `quantileMerge` rollup pattern (reference: pre-aggregated
  * AggregatingMergeTree cubes), built on Spark's own Greenwald-Khanna
  * summaries (`QuantileSummaries`, the structure behind
  * `approxQuantile`). `quantileState(x)` aggregates raw values into a
  * serialized sketch column; `quantileMerge(state, p)` merges sketch
  * columns — hours into days, shards into a total — and reads the
  * p-quantile off the merged sketch. Both have full map-side partial
  * aggregation, and a stored sketch cube never re-scans raw data:
  * that is the point at 100 TB.
  */
object QuantileSketch {

  val RelativeError: Double = 0.01

  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val sampled = c.sampled
    val bos = new java.io.ByteArrayOutputStream(16 + sampled.length * 24)
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(c.count)
    out.writeInt(sampled.length)
    sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n) {
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
    }
    val qs = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, RelativeError, sampled, count, true)
    qs
  }

  def empty(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, RelativeError)

  private[functions] def literalDouble(e: Expression): Double = e.eval() match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => other.toString.toDouble
  }
}

/** `quantileState(x)` → binary sketch of the group's values. */
case class QuantileStateAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QuantileSummaries = QuantileSketch.empty()

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else buf.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => other.toString.toDouble
    })
  }

  override def merge(buf: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
    buf.compress().merge(other.compress())

  override def eval(buf: QuantileSummaries): Any = QuantileSketch.serialize(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileStateAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileStateAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileStateAgg = copy(child = c.head)
}

/** `quantileMerge(state, p)` → p-quantile of the union of the merged
  * sketches (second argument must be a literal probability). */
case class QuantileMergeAgg(
    child: Expression,
    p: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  require(p >= 0.0 && p <= 1.0, s"quantileMerge probability $p outside [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): QuantileSummaries = QuantileSketch.empty()

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else buf.compress().merge(
      QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
    buf.compress().merge(other.compress())

  override def eval(buf: QuantileSummaries): Any = {
    val c = buf.compress()
    if (c.count == 0) null else c.query(p).map(Double.box).orNull
  }

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileMergeAgg = copy(child = c.head)
}
