package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ClickHouse's `-ForEach` combinator for the basic aggregates —
  * `sumForEach`/`minForEach`/`maxForEach`/`avgForEach(array_col)` —
  * element-wise aggregation across the group's arrays: position i of
  * the result aggregates position i of every input array that is long
  * enough. The result length is the group's longest array (CH
  * semantics for ragged inputs: short arrays simply contribute
  * nothing at the tail positions).
  *
  * Reference: ClickHouse -ForEach combinator docs. A native
  * [[TypedImperativeAggregate]] so each task reduces its partition to
  * ONE positional accumulator per group before the shuffle; the
  * compositional posexplode + groupBy(pos) reshape (Embeddings.scala's
  * centroid path) shuffles every array element and returns one ROW per
  * position, not an aggregate value usable inside an arbitrary GROUP
  * BY. Integral element types accumulate exactly in Long (sum/min/max,
  * type-preserving past 2^53); fractional inputs and every avg combine
  * in Double. */
case class ForEachAgg(
    child: Expression,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ForEachAgg.Buf] {

  import ForEachAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  private def integral: Boolean = elementType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact Long path for integral sum/min/max; Double otherwise. */
  private def longPath: Boolean = integral && mode != Avg

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType match {
      case ArrayType(et, _) => et.isInstanceOf[NumericType]
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"${name(mode)} expects array<numeric>, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(if (longPath) LongType else DoubleType, containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf(longPath)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      val et = elementType
      val n = arr.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          if (buf.longs != null) {
            val v = et match {
              case LongType => arr.getLong(i)
              case IntegerType => arr.getInt(i).toLong
              case ShortType => arr.getShort(i).toLong
              case ByteType => arr.getByte(i).toLong
              case other =>
                throw new IllegalStateException(s"unexpected $other")
            }
            buf.putLong(i, v, mode)
          } else {
            val v = et match {
              case DoubleType => arr.getDouble(i)
              case FloatType => arr.getFloat(i).toDouble
              case LongType => arr.getLong(i).toDouble
              case IntegerType => arr.getInt(i).toDouble
              case ShortType => arr.getShort(i).toDouble
              case ByteType => arr.getByte(i).toDouble
              case d: DecimalType =>
                arr.getDecimal(i, d.precision, d.scale).toDouble
              case other =>
                throw new IllegalStateException(s"unexpected $other")
            }
            buf.putDouble(i, v, mode)
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.grow(other.len)
    var i = 0
    while (i < other.len) {
      if (other.counts(i) > 0) {
        if (buf.longs != null)
          buf.mergeLong(i, other.longs(i), other.counts(i), mode)
        else
          buf.mergeDouble(i, other.dbls(i), other.counts(i), mode)
      }
      i += 1
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.len)
    var i = 0
    while (i < buf.len) {
      out(i) =
        if (buf.counts(i) == 0) {
          // a position no row reached cannot exist (len tracks the max
          // seen), but an all-NULL column slot could: CH emits the
          // type default
          if (buf.longs != null) Long.box(0L) else Double.box(0.0)
        } else if (buf.longs != null) Long.box(buf.longs(i))
        else if (mode == Avg) Double.box(buf.dbls(i) / buf.counts(i))
        else Double.box(buf.dbls(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.len)
    out.writeBoolean(buf.longs != null)
    var i = 0
    while (i < buf.len) {
      out.writeLong(buf.counts(i))
      if (buf.longs != null) out.writeLong(buf.longs(i))
      else out.writeDouble(buf.dbls(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val isLong = in.readBoolean()
    val buf = new Buf(isLong)
    buf.grow(n)
    var i = 0
    while (i < n) {
      buf.counts(i) = in.readLong()
      if (isLong) buf.longs(i) = in.readLong()
      else buf.dbls(i) = in.readDouble()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ForEachAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ForEachAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ForEachAgg =
    copy(child = newChildren.head)
  override def prettyName: String = name(mode)
}

object ForEachAgg {
  val Sum = 0
  val Min = 1
  val Max = 2
  val Avg = 3

  private def name(mode: Int): String = mode match {
    case Sum => "sumForEach"
    case Min => "minForEach"
    case Max => "maxForEach"
    case _ => "avgForEach"
  }

  /** Positional accumulator: one slot per array index, grown to the
    * longest array seen. counts(i) > 0 marks a touched slot (and
    * divides avg). Exactly one of longs/dbls is live, fixed at
    * construction by the input's element type and mode. */
  final class Buf(isLong: Boolean) {
    var longs: Array[Long] = if (isLong) Array.emptyLongArray else null
    var dbls: Array[Double] = if (isLong) null else Array.emptyDoubleArray
    var counts: Array[Long] = Array.emptyLongArray
    def len: Int = counts.length

    def grow(n: Int): Unit = if (n > len) {
      counts = java.util.Arrays.copyOf(counts, n)
      if (longs != null) longs = java.util.Arrays.copyOf(longs, n)
      else dbls = java.util.Arrays.copyOf(dbls, n)
    }

    def putLong(i: Int, v: Long, mode: Int): Unit = {
      longs(i) =
        if (counts(i) == 0) v
        else mode match {
          case Sum => longs(i) + v
          case Min => math.min(longs(i), v)
          case _ => math.max(longs(i), v)
        }
      counts(i) += 1
    }

    def putDouble(i: Int, v: Double, mode: Int): Unit = {
      dbls(i) =
        if (counts(i) == 0) v
        else mode match {
          case Sum | Avg => dbls(i) + v
          case Min => math.min(dbls(i), v)
          case _ => math.max(dbls(i), v)
        }
      counts(i) += 1
    }

    def mergeLong(i: Int, v: Long, c: Long, mode: Int): Unit = {
      longs(i) =
        if (counts(i) == 0) v
        else mode match {
          case Sum => longs(i) + v
          case Min => math.min(longs(i), v)
          case _ => math.max(longs(i), v)
        }
      counts(i) += c
    }

    def mergeDouble(i: Int, v: Double, c: Long, mode: Int): Unit = {
      dbls(i) =
        if (counts(i) == 0) v
        else mode match {
          case Sum | Avg => dbls(i) + v
          case Min => math.min(dbls(i), v)
          case _ => math.max(dbls(i), v)
        }
      counts(i) += c
    }
  }
}
