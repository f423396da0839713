package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse's `windowFunnel(window[, mode...])(ts, cond1, …, condN)`:
  * the deepest funnel level reached by chains cond1 → cond2 → … where
  * each stage follows the previous one and the whole chain fits inside
  * `window` microseconds of ITS OWN first event.
  *
  * Semantics mirror the reference engine's scan (one sorted pass over
  * the user's events, one entry per matched condition, `(ts, idx)`
  * ordered): level 0 resets to the LATEST stage-1 event; level s copies
  * level s-1's chain start when a stage-s event lands inside the
  * window. A chain may therefore start at any qualifying stage-1 event
  * — the fixed-anchor join composition
  * ([[graft.operators.Funnel.qFunnel]]) only checks chains anchored at
  * the earliest stage-1 event, which under-counts users who retry.
  *
  * Modes (ClickHouse `windowFunnel(w, 'strict_order')` flags):
  *  - `strict_order`: an event matching NO condition stops the scan
  *    once a stage-1 event has been seen (A→B→D→C yields 2: D freezes
  *    the A→B progress). Only this mode buffers non-matching events.
  *  - `strict_dedup` (alias `strict_deduplication`): an event matching
  *    a condition whose level is already achieved stops the scan —
  *    A→B→B→C yields 2 at the repeated B.
  *  - `strict_increase`: a stage only advances on a strictly greater
  *    timestamp than the previous stage's event.
  *
  * Buffer: one (ts, condIdx) pair per event per matched condition
  * (plus (ts, -1) markers under strict_order); events matching nothing
  * cost nothing otherwise. Eval sorts once and scans in O(entries).
  */
case class WindowFunnelAgg(
    windowUs: Long,
    ts: Expression,
    conds: Seq[Expression],
    strictOrder: Boolean = false,
    strictDedup: Boolean = false,
    strictIncrease: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {

  require(conds.nonEmpty && conds.size <= 32, "windowFunnel takes 1..32 conditions")

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // NTZ carries the same Long-micros physical value; the funnel only
    // differences timestamps, so both instant lines are acceptable
    val ok = (ts.dataType == TimestampType ||
        ts.dataType == TimestampNTZType) &&
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
      val tu = t.asInstanceOf[Long]
      var matched = false
      var i = 0
      while (i < conds.size) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) {
          buf += ((tu, i))
          matched = true
        }
        i += 1
      }
      // only strict_order cares about interleaved foreign events; the
      // (ts, -1) marker sorts before any condition entry at the same ts
      if (!matched && strictOrder) buf += ((tu, -1))
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
    val evs = buf.sortBy(identity) // (ts, condIdx) — deterministic under any merge order
    val n = conds.size
    val None_ = Long.MinValue
    val first = Array.fill(n)(None_) // chain-start ts of the level's chain
    val last = Array.fill(n)(None_) // the level's own event ts
    var stop = false
    var i = 0
    while (i < evs.length && !stop) {
      val (t, idx) = evs(i)
      if (idx < 0) {
        // interleaved foreign event (buffered only under strict_order):
        // freezes all progress once a chain has started
        if (first(0) != None_) stop = true
      } else if (strictDedup && first(idx) != None_) {
        // a repeat of an already-achieved level interrupts the scan
        stop = true
      } else if (idx == 0) {
        first(0) = t
        last(0) = t
      } else if (first(idx - 1) == None_) {
        // out-of-order event; under strict_order it discards any
        // (impossible-here, but kept for fidelity) progress above the gap
        if (strictOrder) {
          var u = 0
          while (u < n && first(u) != None_) u += 1
          while (u < n) { first(u) = None_; last(u) = None_; u += 1 }
        }
      } else if (t - first(idx - 1) <= windowUs &&
          (!strictIncrease || t > last(idx - 1))) {
        first(idx) = first(idx - 1)
        last(idx) = t
      }
      i += 1
    }
    var d = 0
    while (d < n && first(d) != None_) d += 1
    d
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
