package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse's `entropy(x)` aggregate: Shannon entropy (base-2) of the
  * empirical value distribution of a column within each group.
  *
  * Implemented like [[MapCombineAgg]] as a [[TypedImperativeAggregate]]
  * keeping per-value counts, so the combine happens MAP-SIDE: each task
  * reduces its partition to one (value → count) map per group before
  * the shuffle — the compositional two-level `GROUP BY` costs an extra
  * full shuffle of the distinct values. Intended for low-cardinality
  * columns (categories, labels, event types), same contract as the
  * reference function.
  *
  * Keys: string, integral, boolean, or date (stored as the underlying
  * long); null inputs are skipped (ClickHouse skips NULL in aggregates).
  */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private def stringKeys: Boolean = child.dataType == StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType match {
      case StringType | BooleanType | DateType => true
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"entropy expects a string/integral/boolean/date column, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // unsafe row slots are reused buffers — materialize string keys
      val k: Any = child.dataType match {
        case StringType => v.toString
        case BooleanType => if (v.asInstanceOf[Boolean]) 1L else 0L
        case ByteType => v.asInstanceOf[Byte].toLong
        case ShortType => v.asInstanceOf[Short].toLong
        case IntegerType | DateType => v.asInstanceOf[Int].toLong
        case LongType => v.asInstanceOf[Long]
        case other => throw new IllegalStateException(s"unsupported entropy input $other")
      }
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return 0.0
    val n = buf.valuesIterator.sum.toDouble
    // deterministic term order (sorted counts) so the same group always
    // reduces to the bit-identical double regardless of hash-map order
    var acc = 0.0
    buf.values.toArray.sorted.foreach { c =>
      val p = c / n
      acc -= p * (math.log(p) / math.log(2.0))
    }
    acc
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      if (stringKeys) {
        val kb = k.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(kb.length)
        out.write(kb)
      } else out.writeLong(k.asInstanceOf[Long])
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any =
        if (stringKeys) {
          val kb = new Array[Byte](in.readInt())
          in.readFully(kb)
          new String(kb, java.nio.charset.StandardCharsets.UTF_8)
        } else in.readLong()
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EntropyAgg =
    copy(child = newChildren(0))
}
