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
  * Keys: string or integral (int/long) element types; string keys sort
  * in UTF-8 binary order (ClickHouse/Spark UTF8String order, not Java
  * UTF-16 order — they differ for supplementary-plane characters).
  * Values: any numeric. Integral value inputs accumulate and return as
  * `bigint` (type-preserving, exact past 2^53 where a double mantissa
  * loses integer precision); fractional/decimal inputs combine in
  * double. Key arrays shorter/longer than the value array contribute
  * only the zipped prefix (ClickHouse requires equal sizes; we take
  * the common prefix rather than erroring).
  */
case class MapCombineAgg(
    keys: Expression,
    values: Expression,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Any]] {

  import MapCombineAgg._

  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false

  private def keyType: DataType = keys.dataType match {
    case ArrayType(et, _) => et
    case other => other // unresolved input surfaces as an analysis error
  }

  private def stringKeys: Boolean = keyType == StringType

  /** Integral inputs keep an exact Long accumulation path. */
  private def integralVals: Boolean = values.dataType match {
    case ArrayType(et, _) => et match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    case _ => false
  }

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
    StructField("vals",
      ArrayType(if (integralVals) LongType else DoubleType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): mutable.HashMap[Any, Any] =
    mutable.HashMap.empty

  // buffer values are uniformly java.lang.Long (integralVals) or
  // java.lang.Double — picked once by the input's element type, so the
  // unchecked casts below never cross paths
  private def combine(buf: mutable.HashMap[Any, Any], k: Any, v: Any): Unit = {
    val next = buf.get(k) match {
      case None => v
      case Some(c) =>
        if (integralVals) {
          val cl = c.asInstanceOf[Long]; val vl = v.asInstanceOf[Long]
          mode match {
            case Sum => Long.box(cl + vl)
            case Min => Long.box(math.min(cl, vl))
            case Max => Long.box(math.max(cl, vl))
          }
        } else {
          val cd = c.asInstanceOf[Double]; val vd = v.asInstanceOf[Double]
          mode match {
            case Sum => Double.box(cd + vd)
            case Min => Double.box(math.min(cd, vd))
            case Max => Double.box(math.max(cd, vd))
          }
        }
    }
    buf.update(k, next)
  }

  override def update(
      buf: mutable.HashMap[Any, Any], input: InternalRow): mutable.HashMap[Any, Any] = {
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
          val v: Any = vt match {
            case LongType => Long.box(va.getLong(i))
            case IntegerType => Long.box(va.getInt(i).toLong)
            case ShortType => Long.box(va.getShort(i).toLong)
            case ByteType => Long.box(va.getByte(i).toLong)
            case DoubleType => Double.box(va.getDouble(i))
            case FloatType => Double.box(va.getFloat(i).toDouble)
            case d: DecimalType =>
              Double.box(va.getDecimal(i, d.precision, d.scale).toDouble)
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
      buf: mutable.HashMap[Any, Any],
      other: mutable.HashMap[Any, Any]): mutable.HashMap[Any, Any] = {
    other.foreach { case (k, v) => combine(buf, k, v) }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Any]): Any = {
    // string keys: UTF-8 binary order (UTF8String.compareTo), matching
    // the engine's ORDER BY on the same column
    val sorted =
      if (stringKeys)
        buf.toSeq
          .map { case (k, v) => (UTF8String.fromString(k.asInstanceOf[String]), v) }
          .sortBy(_._1)
      else buf.toSeq.sortBy(_._1.asInstanceOf[Long])
    val keysOut: Array[Any] = sorted.map { case (k, _) =>
      keyType match {
        case StringType => k
        case IntegerType => Int.box(k.asInstanceOf[Long].toInt)
        case LongType => Long.box(k.asInstanceOf[Long])
        case other => throw new IllegalStateException(s"unsupported key type $other")
      }
    }.toArray
    val valsOut: Array[Any] = sorted.map(_._2).toArray
    InternalRow(new GenericArrayData(keysOut), new GenericArrayData(valsOut))
  }

  override def serialize(buf: mutable.HashMap[Any, Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      if (stringKeys) {
        // length-prefixed UTF-8 (writeUTF caps at 65535 bytes and
        // throws on longer keys — a shuffle-time crash on wide keys)
        val kb = k.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(kb.length)
        out.write(kb)
      } else out.writeLong(k.asInstanceOf[Long])
      if (integralVals) out.writeLong(v.asInstanceOf[Long])
      else out.writeDouble(v.asInstanceOf[Double])
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Any]
    var i = 0
    while (i < n) {
      val k: Any =
        if (stringKeys) {
          val kb = new Array[Byte](in.readInt())
          in.readFully(kb)
          new String(kb, java.nio.charset.StandardCharsets.UTF_8)
        } else in.readLong()
      val v: Any =
        if (integralVals) Long.box(in.readLong()) else Double.box(in.readDouble())
      buf.update(k, v)
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
