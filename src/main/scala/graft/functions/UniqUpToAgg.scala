package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `uniqUpTo(N)(x)`: the exact distinct count while it is
  * ≤ N, and N+1 as soon as it exceeds N — the "are there more than N?"
  * probe.
  *
  * The whole point of the function is the BOUNDED state (CH documents
  * ~N·sizeof(value) per group), so this is a native
  * [[TypedImperativeAggregate]] whose buffer saturates at N+1 distinct
  * values: each map task reduces its partition to at most N+1 keys per
  * group before the shuffle, and merges union with the same cap. The
  * previous composition `least(count(DISTINCT x), N+1)` answered the
  * same number but shuffled EVERY distinct value through Spark's
  * two-phase exact-distinct expansion — the state no longer grows with
  * column cardinality, which is the 100 TB contract.
  *
  * Value canonicalization follows [[EntropyAgg]] (strings materialize,
  * integrals/booleans/dates widen to Long, floats to Double); null
  * inputs are skipped like every CH aggregate. */
case class UniqUpToAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]] {

  require(cap >= 0, s"uniqUpTo N must be >= 0, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "uniqUpTo"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType match {
      case StringType | BooleanType | DateType => true
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType => true
      case _: DecimalType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"uniqUpTo expects a scalar column, got ${child.dataType.simpleString}")
  }

  private def keyOf(v: Any): Any = child.dataType match {
    case StringType => v.toString
    case BooleanType => if (v.asInstanceOf[Boolean]) 1L else 0L
    case ByteType => v.asInstanceOf[Byte].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case IntegerType | DateType => v.asInstanceOf[Int].toLong
    case LongType | TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    case FloatType => v.asInstanceOf[Float].toDouble
    case DoubleType => v.asInstanceOf[Double]
    case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal
      .stripTrailingZeros.toString
  }

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  override def update(
      buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    if (buf.size <= cap) {
      val v = child.eval(input)
      if (v != null) buf += keyOf(v)
    }
    buf
  }

  override def merge(
      buf: mutable.HashSet[Any],
      other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (buf.size <= cap && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.HashSet[Any]): Any =
    math.min(buf.size.toLong, cap.toLong + 1L)

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(16 + buf.size * 12)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach {
      case l: Long => out.writeByte(0); out.writeLong(l)
      case d: Double => out.writeByte(1); out.writeDouble(d)
      case s: String =>
        val b = s.getBytes("UTF-8")
        out.writeByte(2); out.writeInt(b.length); out.write(b)
      case other =>
        val b = other.toString.getBytes("UTF-8")
        out.writeByte(2); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashSet.empty[Any]
    var i = 0
    while (i < n) {
      in.readByte() match {
        case 0 => buf += in.readLong()
        case 1 => buf += in.readDouble()
        case _ =>
          val b = new Array[Byte](in.readInt())
          in.readFully(b)
          buf += new String(b, "UTF-8")
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): UniqUpToAgg =
    copy(child = c(0))
}
