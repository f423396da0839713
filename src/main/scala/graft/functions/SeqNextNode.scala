package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `sequenceNextNode(direction, base)(ts, value, base_cond,
  * event1, …, eventN)`: walk the group's events in timestamp order and
  * return the `value` of the event immediately AFTER the matched chain
  * (NULL when the chain doesn't match or runs off the sequence).
  *
  * `direction` picks the walk order — `forward` ascending, `backward`
  * descending. `base` anchors the chain on the walk:
  *  - `head`: the time-FIRST event (walk position 0 going forward);
  *  - `tail`: the time-LAST event;
  *  - `first_match` / `last_match`: the first / last walk position
  *    where `event1` holds.
  * `base_cond` must hold at the anchor; `event_i` must hold at the
  * i-th walk position from the anchor (so `event1` tests the anchor
  * itself); the answer is the value one past the N-th.
  *
  * State: one `(ts, flags, value)` entry per event — the same
  * O(group-size) buffer class as `groupArray`, mergeable map-side in
  * any order (eval sorts on the full `(ts, flags, value)` key, so ties
  * resolve deterministically under every merge interleaving).
  *
  * Reference behavior: mcp_server.py:433-459 passes arbitrary pasted
  * ClickHouse SELECTs through; this spelling is CH's path-analysis
  * staple next to windowFunnel/retention (see [[WindowFunnelAgg]]).
  */
case class SequenceNextNodeAgg(
    forward: Boolean,
    base: String,
    ts: Expression,
    value: Expression,
    conds: Seq[Expression], // base_cond +: events
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int, UTF8String)]] {

  require(Set("head", "tail", "first_match", "last_match")(base),
    s"sequenceNextNode base must be head|tail|first_match|last_match, got '$base'")
  require(conds.nonEmpty && conds.size <= 32,
    "sequenceNextNode takes a base condition and up to 31 events")

  override def children: Seq[Expression] = Seq(ts, value) ++ conds
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val tsOk = ts.dataType match {
      case TimestampType | TimestampNTZType | DateType => true
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (tsOk && value.dataType == StringType &&
      conds.forall(_.dataType == BooleanType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "sequenceNextNode expects (timestamp-or-int ts, string value, " +
        "boolean conds...), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  private def tsLong(input: InternalRow): Option[Long] = {
    val t = ts.eval(input)
    if (t == null) None
    else Some(t match {
      case i: java.lang.Integer => i.toLong // DateType days / int
      case l: java.lang.Long => l
      case s: java.lang.Short => s.toLong
      case b: java.lang.Byte => b.toLong
    })
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int, UTF8String)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int, UTF8String)],
      input: InternalRow): ArrayBuffer[(Long, Int, UTF8String)] = {
    tsLong(input).foreach { t =>
      var flags = 0
      var i = 0
      while (i < conds.size) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) flags |= (1 << i)
        i += 1
      }
      val v = value.eval(input).asInstanceOf[UTF8String]
      buf += ((t, flags, if (v == null) null else v.clone()))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Int, UTF8String)],
      other: ArrayBuffer[(Long, Int, UTF8String)])
      : ArrayBuffer[(Long, Int, UTF8String)] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Int, UTF8String)]): Any = {
    if (buf.isEmpty) return null
    // deterministic total order: ts, then flags, then value (nulls first)
    val asc = buf.sortWith { (a, b) =>
      if (a._1 != b._1) a._1 < b._1
      else if (a._2 != b._2) a._2 < b._2
      else (a._3, b._3) match {
        case (null, null) => false
        case (null, _) => true
        case (_, null) => false
        case (x, y) => x.compareTo(y) < 0
      }
    }
    val walk = if (forward) asc else asc.reverse
    val events = conds.size - 1 // conds(0) is base_cond
    def holds(pos: Int, condIdx: Int): Boolean =
      (walk(pos)._2 & (1 << condIdx)) != 0
    val anchor = base match {
      case "head" => if (forward) 0 else walk.length - 1
      case "tail" => if (forward) walk.length - 1 else 0
      case "first_match" => walk.indexWhere(e => (e._2 & 2) != 0)
      case "last_match" => walk.lastIndexWhere(e => (e._2 & 2) != 0)
    }
    if (anchor < 0 || !holds(anchor, 0)) return null
    var i = 1
    while (i <= events) {
      val pos = anchor + i - 1
      if (pos >= walk.length || !holds(pos, i)) return null
      i += 1
    }
    val next = anchor + events
    if (next >= walk.length) null
    else {
      val v = walk(next)._3
      if (v == null) null else v.clone()
    }
  }

  override def serialize(buf: ArrayBuffer[(Long, Int, UTF8String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, f, v) =>
      out.writeLong(t)
      out.writeInt(f)
      if (v == null) out.writeInt(-1)
      else {
        val b = v.getBytes
        out.writeInt(b.length)
        out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int, UTF8String)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Long, Int, UTF8String)]
    var i = 0
    while (i < n) {
      val t = in.readLong()
      val f = in.readInt()
      val vl = in.readInt()
      val v = if (vl < 0) null
      else {
        val b = new Array[Byte](vl)
        in.readFully(b)
        UTF8String.fromBytes(b)
      }
      buf += ((t, f, v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceNextNodeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceNextNodeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceNextNodeAgg =
    copy(ts = newChildren(0), value = newChildren(1), conds = newChildren.drop(2))
}
