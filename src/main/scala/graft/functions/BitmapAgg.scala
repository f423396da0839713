package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** groupBitmapAnd / groupBitmapOr / groupBitmapXor (reference dialect:
  * the bitmap-state mergers). Graft's bitmap representation is a
  * sorted distinct array<bigint> (see the bitmap section of
  * [[CHFunctions]]); this aggregate folds one bitmap column per row
  * into the group's AND / OR / XOR.
  *
  * One state serves all three ops: (rows seen, element → number of
  * rows containing it). Counts add under merge, so partial aggregation
  * is exact in any order — AND keeps elements with count == rows, OR
  * keeps all, XOR keeps odd counts (symmetric difference over rows).
  * State size is bounded by the distinct-element universe, the same
  * contract as a roaring-bitmap union tree.
  */
object BitmapCombineAgg {
  sealed trait Op
  case object And extends Op
  case object Or extends Op
  case object Xor extends Op

  final class State(
      var rows: Long,
      val counts: mutable.HashMap[Long, Long])
}

case class BitmapCombineAgg(
    child: Expression,
    op: BitmapCombineAgg.Op,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapCombineAgg.State] {

  import BitmapCombineAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = op match {
    case And => "groupBitmapAnd"
    case Or => "groupBitmapOr"
    case Xor => "groupBitmapXor"
  }

  override def createAggregationBuffer(): State =
    new State(0L, mutable.HashMap.empty)

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      buf.rows += 1
      val arr = v.asInstanceOf[ArrayData]
      // bitmaps are distinct by construction; a raw array input is
      // de-dup'd here so each row contributes at most 1 per element
      val seen = mutable.HashSet.empty[Long]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val e = arr.getLong(i)
          if (seen.add(e))
            buf.counts.update(e, buf.counts.getOrElse(e, 0L) + 1L)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: State, other: State): State = {
    buf.rows += other.rows
    other.counts.foreach { case (k, v) =>
      buf.counts.update(k, buf.counts.getOrElse(k, 0L) + v)
    }
    buf
  }

  override def eval(buf: State): Any = {
    if (buf.rows == 0) return null
    val keep = op match {
      case And => buf.counts.iterator.filter(_._2 == buf.rows).map(_._1)
      case Or => buf.counts.keysIterator
      case Xor => buf.counts.iterator.filter(kv => (kv._2 & 1L) == 1L).map(_._1)
    }
    new GenericArrayData(keep.toArray.sorted)
  }

  override def serialize(buf: State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(12 + buf.counts.size * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.rows)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, v) => out.writeLong(k); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val rows = in.readLong()
    val n = in.readInt()
    val counts = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { counts.update(in.readLong(), in.readLong()); i += 1 }
    new State(rows, counts)
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapCombineAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapCombineAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BitmapCombineAgg =
    copy(child = c(0))
}
