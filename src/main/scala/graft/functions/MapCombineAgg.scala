package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `sumMap`/`minMap`/`maxMap` aggregate shape: each input
  * row carries parallel `keys`/`values` arrays; the aggregate combines
  * values per key across all rows of the group and returns
  * `struct(keys, vals)` with keys sorted ascending.
  *
  * Reference semantics: ClickHouse sumMap docs (the
  * AggregatingMergeTree per-key rollup pattern). Implemented as a
  * [[TypedImperativeAggregate]] so the per-key map combines MAP-SIDE:
  * each task reduces its partition to one (key → value) map per group
  * before the shuffle — the same reason [[CosTopK]] exists. A
  * compositional explode + groupBy would shuffle every array element.
  *
  * Keys: string or integral (int/long) element types; values: any
  * numeric, combined in double. Key arrays shorter/longer than the
  * value array contribute only the zipped prefix (ClickHouse requires
  * equal sizes; we take the common prefix rather than erroring).
  */
case class MapCombineAgg(
    keys: Expression,
    values: Expression,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Double]] {

  import MapCombineAgg._

  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false

  private def keyType: DataType = keys.dataType match {
    case ArrayType(et, _) => et
    case other => other // unresolved input surfaces as an analysis error
  }

  private def stringKeys: Boolean = keyType == StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (keys.dataType, values.dataType) match {
      case (ArrayType(kt, _), ArrayType(vt, _)) =>
        (kt == StringType || kt == IntegerType || kt == LongType) &&
          vt.isInstanceOf[NumericType]
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "sumMap/minMap/maxMap expect (array<string|int|long> keys, array<numeric> values), got " +
        s"(${keys.dataType.simpleString}, ${values.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("keys", ArrayType(keyType, containsNull = false), nullable = false),
    StructField("vals", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): mutable.HashMap[Any, Double] =
    mutable.HashMap.empty

  private def combine(buf: mutable.HashMap[Any, Double], k: Any, v: Double): Unit = {
    val cur = buf.get(k)
    val next = cur match {
      case None => v
      case Some(c) => mode match {
        case Sum => c + v
        case Min => math.min(c, v)
        case Max => math.max(c, v)
      }
    }
    buf.update(k, next)
  }

  override def update(
      buf: mutable.HashMap[Any, Double], input: InternalRow): mutable.HashMap[Any, Double] = {
    val ka = keys.eval(input).asInstanceOf[ArrayData]
    val va = values.eval(input).asInstanceOf[ArrayData]
    if (ka != null && va != null) {
      val vt = values.dataType.asInstanceOf[ArrayType].elementType
      val n = math.min(ka.numElements(), va.numElements())
      var i = 0
      while (i < n) {
        if (!ka.isNullAt(i) && !va.isNullAt(i)) {
          // unsafe array slots are reused buffers — materialize the key
          val k: Any = keyType match {
            case StringType => ka.getUTF8String(i).toString
            case IntegerType => ka.getInt(i).toLong
            case LongType => ka.getLong(i)
            case other => throw new IllegalStateException(s"unsupported key type $other")
          }
          val v = vt match {
            case DoubleType => va.getDouble(i)
            case FloatType => va.getFloat(i).toDouble
            case LongType => va.getLong(i).toDouble
            case IntegerType => va.getInt(i).toDouble
            case ShortType => va.getShort(i).toDouble
            case ByteType => va.getByte(i).toDouble
            case d: DecimalType => va.getDecimal(i, d.precision, d.scale).toDouble
            case other => throw new IllegalStateException(s"unsupported value type $other")
          }
          combine(buf, k, v)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Double],
      other: mutable.HashMap[Any, Double]): mutable.HashMap[Any, Double] = {
    other.foreach { case (k, v) => combine(buf, k, v) }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Double]): Any = {
    val sorted =
      if (stringKeys) buf.toSeq.sortBy(_._1.asInstanceOf[String])
      else buf.toSeq.sortBy(_._1.asInstanceOf[Long])
    val keysOut: Array[Any] = sorted.map { case (k, _) =>
      keyType match {
        case StringType => UTF8String.fromString(k.asInstanceOf[String])
        case IntegerType => Int.box(k.asInstanceOf[Long].toInt)
        case LongType => Long.box(k.asInstanceOf[Long])
        case other => throw new IllegalStateException(s"unsupported key type $other")
      }
    }.toArray
    val valsOut: Array[Any] = sorted.map(p => Double.box(p._2)).toArray
    InternalRow(new GenericArrayData(keysOut), new GenericArrayData(valsOut))
  }

  override def serialize(buf: mutable.HashMap[Any, Double]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      if (stringKeys) out.writeUTF(k.asInstanceOf[String])
      else out.writeLong(k.asInstanceOf[Long])
      out.writeDouble(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Double] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Double]
    var i = 0
    while (i < n) {
      val k: Any = if (stringKeys) in.readUTF() else in.readLong()
      buf.update(k, in.readDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapCombineAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapCombineAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MapCombineAgg =
    copy(keys = newChildren(0), values = newChildren(1))
}

object MapCombineAgg {
  val Sum = 0
  val Min = 1
  val Max = 2
}
