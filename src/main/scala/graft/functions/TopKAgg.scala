package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over `struct(score double, id long)` rows:
  * keeps the k best (highest score, ties to the lower id) and returns
  * them as a sorted `array<struct<neighbor long, cos_sim double>>`.
  *
  * The point of this being a [[TypedImperativeAggregate]] rather than a
  * `row_number` window is PARTIAL AGGREGATION: each map task reduces its
  * partition to ≤ k rows per group before the shuffle, so a top-k over
  * (n_queries × n_candidates) scored pairs ships only
  * n_queries × partitions × k rows and no single reducer ever sees a
  * query's full candidate list. A per-query window would funnel each
  * query's candidates through one reducer — the bottleneck the 100 TB
  * ANN path ([[graft.operators.Ann]]) must avoid.
  */
case class CosTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "cosTopK requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor", LongType, nullable = false),
      StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** Total order even under NaN scores (a zero vector makes cosine
    * NaN): `Double.compare` ranks NaN above every number — matching
    * Spark's descending window order — where a naive `>`/`==` pair is
    * inconsistent for NaN and makes the sort order-dependent. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def truncate(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val best = buf.sortWith(better).take(k)
      buf.clear()
      buf ++= best
    }
    buf
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
      buf += ((row.getDouble(0), row.getLong(1)))
      if (buf.length >= 2 * k) truncate(buf) // amortized O(k) state
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    truncate(buf ++= other)

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.sortWith(better).take(k).map(p => InternalRow(p._2, p._1)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val best = buf.sortWith(better).take(k)
    val bos = new java.io.ByteArrayOutputStream(4 + best.length * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(best.length)
    best.foreach { p => out.writeDouble(p._1); out.writeLong(p._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { val d = in.readDouble(); val l = in.readLong(); buf += ((d, l)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CosTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CosTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CosTopK =
    copy(child = newChildren.head)
}
