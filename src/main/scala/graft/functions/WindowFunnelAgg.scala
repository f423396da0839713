package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse's `windowFunnel(window)(ts, cond1, …, condN)`: the
  * length of the longest PREFIX chain cond1 → cond2 → … where each
  * event strictly follows the previous stage's event and the whole
  * chain fits inside `window` microseconds of ITS OWN first event.
  *
  * This is the exact sliding-chain semantics — a chain may start at
  * any qualifying cond1 event, so a late view that opens a successful
  * funnel counts even when the user's first view led nowhere. The
  * fixed-anchor join composition ([[graft.operators.Funnel.qFunnel]])
  * only checks chains anchored at the earliest stage-1 event; this
  * aggregate exists because that anchor bias is wrong whenever users
  * retry.
  *
  * Buffer: one (ts, stage-bitmask) pair per event that matches ≥ 1
  * condition — the same per-user event buffer ClickHouse keeps; events
  * matching no condition cost nothing. Eval sorts once and runs the
  * standard O(events × stages) DP: `best(s)` = earliest chain-start
  * time of any depth-s chain ending at or before the current event.
  */
case class WindowFunnelAgg(
    windowUs: Long,
    ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {

  require(conds.nonEmpty && conds.size <= 32, "windowFunnel takes 1..32 conditions")

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = ts.dataType == TimestampType &&
      conds.forall(_.dataType == BooleanType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "windowFunnel expects (timestamp ts, boolean conds...), got " +
        (ts +: conds).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int)],
      input: InternalRow): ArrayBuffer[(Long, Int)] = {
    val t = ts.eval(input)
    if (t != null) {
      var mask = 0
      var i = 0
      while (i < conds.size) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) mask |= 1 << i
        i += 1
      }
      if (mask != 0) buf += ((t.asInstanceOf[Long], mask))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Int)],
      other: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    if (buf.isEmpty) return 0
    // tiebreak equal timestamps by stage mask so the result is
    // independent of partition merge order (insertion order is not)
    val evs = buf.sortBy(e => (e._1, e._2))
    val n = conds.size
    // best(s): earliest chain-start ts among depth-(s+1) chains seen so
    // far (Long.MinValue sentinel = none). A stage-s event at time t
    // extends a depth-s chain to depth s+1 if that chain started
    // within [t - window, t).
    val best = Array.fill(n)(Long.MinValue)
    var depth = 0
    evs.foreach { case (t, mask) =>
      // walk stages high→low so one event can't satisfy two stages of
      // the same chain instance in a single step
      var s = n - 1
      while (s >= 1) {
        if ((mask & (1 << s)) != 0 && best(s - 1) != Long.MinValue &&
            t - best(s - 1) <= windowUs && t >= best(s - 1)) {
          if (best(s - 1) > best(s)) best(s) = best(s - 1)
          if (s + 1 > depth) depth = s + 1
        }
        s -= 1
      }
      if ((mask & 1) != 0) {
        if (t > best(0)) best(0) = t
        if (depth == 0) depth = 1
      }
    }
    depth
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, m) => out.writeLong(t); out.writeInt(m) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Long, Int)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readInt())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnelAgg =
    copy(ts = newChildren.head, conds = newChildren.tail)
}
