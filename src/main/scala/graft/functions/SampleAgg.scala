package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ClickHouse's `groupArraySample(k)(x)` shape, made DETERMINISTIC:
  * a bottom-k-by-hash sketch. Each value ranks by
  * `md5(toString(value))`; the aggregate keeps the k smallest ranks.
  *
  * Hash-rank bottom-k IS a uniform sample without replacement, and
  * unlike a true reservoir it is mergeable with a deterministic
  * result: the same group samples the same rows regardless of
  * partitioning, task order, or retries — the property
  * [[graft.operators.Curation]]'s md5 data-mixing relies on, applied
  * to sampling. Partial buffers cap at k entries map-side, so the
  * shuffle carries ≤ k (hash, value, count) triples per group per
  * task. Duplicate input values keep a per-value multiplicity, so the
  * sample is over ROWS like ClickHouse's (equal values share one rank
  * and fill adjacent sample slots), not over distinct values.
  * The emitted array sorts ascending by value (presentation order;
  * membership is what the hash decides). md5-of-decimal-string is
  * replayable in the DuckDB oracle, so the sample is verifiable
  * cross-engine.
  *
  * Input: integral (long) values — ids are what one samples at scale.
  */
case class SampleAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleAgg.Buf] {

  require(k > 0, "groupArraySample requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"groupArraySample expects an integral column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): SampleAgg.Buf = new SampleAgg.Buf

  /** Add `n` occurrences of `key`, then trim occurrences from the
    * LARGEST rank down until ≤ k rows remain — deterministic under any
    * merge order because the surviving multiset depends only on the
    * combined input. The running total is tracked incrementally (a
    * per-row recount was a measured 5× regression on the bench). */
  private def add(buf: SampleAgg.Buf, key: (String, Long), n: Long): Unit = {
    // full-buffer fast path (r20): a candidate ranking at-or-after the
    // current worst would be inserted and immediately trimmed back out —
    // identical surviving multiset, minus the TreeMap churn. (On equal
    // keys the insert+trim nets zero too: the trim drops from the
    // LARGEST rank, which is the candidate itself.)
    if (buf.total >= k && n > 0 &&
        implicitly[Ordering[(String, Long)]].compare(key, buf.m.lastKey) >= 0)
      return
    buf.m.update(key, buf.m.getOrElse(key, 0L) + n)
    buf.total += n
    while (buf.total > k) {
      val last = buf.m.lastKey
      val c = buf.m(last)
      val drop = math.min(c, buf.total - k)
      if (drop == c) buf.m.remove(last) else buf.m.update(last, c - drop)
      buf.total -= drop
    }
  }

  override def update(buf: SampleAgg.Buf, input: InternalRow): SampleAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val l = child.dataType match {
        case ByteType => v.asInstanceOf[Byte].toLong
        case ShortType => v.asInstanceOf[Short].toLong
        case IntegerType => v.asInstanceOf[Int].toLong
        case LongType => v.asInstanceOf[Long]
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      add(buf, (SampleAgg.md5Hex(l.toString), l), 1L)
    }
    buf
  }

  override def merge(buf: SampleAgg.Buf, other: SampleAgg.Buf): SampleAgg.Buf = {
    other.m.iterator.foreach { case (key, n) => add(buf, key, n) }
    buf
  }

  override def eval(buf: SampleAgg.Buf): Any = {
    val out = mutable.ArrayBuffer.empty[Long]
    buf.m.iterator.foreach { case ((_, v), n) =>
      var i = 0L
      while (i < n) { out += v; i += 1 }
    }
    new GenericArrayData(out.toArray.sorted.map(Long.box(_): Any))
  }

  override def serialize(buf: SampleAgg.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.iterator.foreach { case ((_, l), n) => out.writeLong(l); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SampleAgg.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SampleAgg.Buf
    var i = 0
    while (i < n) {
      val l = in.readLong()
      val c = in.readLong()
      buf.m.update((SampleAgg.md5Hex(l.toString), l), c)
      buf.total += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleAgg =
    copy(child = newChildren(0))
}

object SampleAgg {

  /** Aggregation buffer: the bottom-k multiset plus its tracked size. */
  final class Buf {
    val m: mutable.TreeMap[(String, Long), Long] = mutable.TreeMap.empty
    var total: Long = 0L
  }

  // r20: this runs once per input ROW — getInstance("MD5") per call and
  // per-byte `f"%02x"` interpolation (a format-string parse + boxing per
  // byte) dominated the update path. ThreadLocal digest + table-driven
  // hex produce the identical string.
  private val digestPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val md = digestPool.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
