package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Categorical-association aggregates under ClickHouse names
  * (reference dialect: cramersV / cramersVBiasCorrected / theilsU /
  * contingency — the cross-tab family).
  *
  * All four share one distributed shape: the partial state is the
  * CONTINGENCY TABLE (cell → count), not the rows, so map-side combine
  * reduces each partition to at most |X|×|Y| entries before the
  * shuffle and merges commute — the 100 TB contract is "distinct
  * category pairs fit in memory", the same as ClickHouse's CrossTab
  * states. eval() folds the table in sorted-cell order, so the
  * floating result is identical for every partitioning and replays
  * bit-for-bit in an oracle that sums in the same (x, y) order.
  *
  * Definitions (n rows, r = |X|, c = |Y|, o = cell count, e = rowTot ×
  * colTot / n): chi² = Σ (o−e)²/e;
  *   cramersV           = sqrt(chi²/n / min(r−1, c−1))
  *   cramersVBiasCorrected — Bergsma's φ²⁺ = max(0, φ² − (r−1)(c−1)/(n−1))
  *     with r⁺ = r − (r−1)²/(n−1), c⁺ = c − (c−1)²/(n−1)
  *   contingency        = sqrt(chi² / (chi² + n))
  *   theilsU(x, y)      = (H(X) − H(X|Y)) / H(X), natural log —
  *     asymmetric: how much knowing Y reduces uncertainty about X.
  */
object CrossTabAgg {
  sealed trait Stat
  case object CramersV extends Stat
  case object CramersVBC extends Stat
  case object TheilsU extends Stat
  case object Contingency extends Stat

  type Table = mutable.HashMap[(String, String), Long]
}

case class CrossTabAgg(
    x: Expression,
    y: Expression,
    stat: CrossTabAgg.Stat,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CrossTabAgg.Table] {

  import CrossTabAgg._

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = stat match {
    case CramersV => "cramersV"
    case CramersVBC => "cramersVBiasCorrected"
    case TheilsU => "theilsU"
    case Contingency => "contingency"
  }

  override def createAggregationBuffer(): Table = mutable.HashMap.empty

  override def update(buf: Table, input: InternalRow): Table = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      val k = (xv.toString, yv.toString)
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: Table, other: Table): Table = {
    other.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
    buf
  }

  override def eval(buf: Table): Any = {
    if (buf.isEmpty) return null
    val cells = buf.toIndexedSeq.sortBy(_._1)
    val rowTot = mutable.TreeMap.empty[String, Long]
    val colTot = mutable.TreeMap.empty[String, Long]
    var n = 0L
    cells.foreach { case ((a, b), c) =>
      rowTot.update(a, rowTot.getOrElse(a, 0L) + c)
      colTot.update(b, colTot.getOrElse(b, 0L) + c)
      n += c
    }
    val r = rowTot.size
    val c = colTot.size
    val nd = n.toDouble
    stat match {
      case TheilsU =>
        // hx = Σ p(a) ln p(a) (= −H(X)); hxy = Σ p(a,b) ln(p(a,b)/p(b))
        var hx = 0.0
        rowTot.foreach { case (_, ra) =>
          val p = ra / nd; hx += p * math.log(p)
        }
        if (hx == 0.0) return null // X constant: U undefined
        var hxy = 0.0
        cells.foreach { case ((_, b), o) =>
          hxy += (o / nd) * math.log(o.toDouble / colTot(b))
        }
        (hx - hxy) / hx
      case _ =>
        var chi2 = 0.0
        cells.foreach { case ((a, b), o) =>
          val e = rowTot(a).toDouble * colTot(b) / nd
          val d = o - e
          chi2 += d * d / e
        }
        stat match {
          case Contingency => math.sqrt(chi2 / (chi2 + nd))
          case CramersV =>
            val k = math.min(r, c) - 1
            if (k < 1) return null
            math.sqrt(chi2 / nd / k)
          case CramersVBC =>
            if (n < 2) return null
            val phi2 = chi2 / nd
            val phi2c =
              math.max(0.0, phi2 - (r - 1.0) * (c - 1.0) / (n - 1.0))
            val rc = r - (r - 1.0) * (r - 1.0) / (n - 1.0)
            val cc = c - (c - 1.0) * (c - 1.0) / (n - 1.0)
            val k = math.min(rc, cc) - 1.0
            if (k <= 0.0) return null
            math.sqrt(phi2c / k)
          case TheilsU => null // unreachable
        }
    }
  }

  override def serialize(buf: Table): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(4 + buf.size * 24)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case ((a, b), c) =>
      out.writeUTF(a); out.writeUTF(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Table = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[(String, String), Long]
    var i = 0
    while (i < n) {
      buf.update((in.readUTF(), in.readUTF()), in.readLong()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CrossTabAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CrossTabAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CrossTabAgg =
    copy(x = c(0), y = c(1))
}

/** meanZTest(pop_var_x, pop_var_y, confidence)(value, sample_index) →
  * struct(z_stat, p_value, ci_low, ci_high): two-sample z-test with
  * KNOWN population variances. Only sufficient statistics (n, Σv per
  * sample) are kept, so the state is 32 bytes and partial-aggregates
  * map-side in any merge order. The confidence interval is on the mean
  * difference: (m0 − m1) ± z_crit · se with z_crit = Φ⁻¹((1+conf)/2)
  * solved by Newton on the same erfc used for the p-value.
  */
case class MeanZTestAgg(
    popVarX: Expression,
    popVarY: Expression,
    confidence: Expression,
    value: Expression,
    idx: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] =
    Seq(popVarX, popVarY, confidence, value, idx)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("z_stat", DoubleType), StructField("p_value", DoubleType),
    StructField("ci_low", DoubleType), StructField("ci_high", DoubleType)))
  override def prettyName: String = "meanZTest"

  // (n0, sum0, n1, sum1)
  override def createAggregationBuffer(): Array[Double] = new Array[Double](4)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = value.eval(input)
    val g = idx.eval(input)
    if (v != null && g != null) {
      val o = (StatTests.asIdx(g) & 1) * 2
      buf(o) += 1.0
      buf(o + 1) += StatTests.asDouble(v)
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 4) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val n0 = buf(0); val n1 = buf(2)
    if (n0 < 1 || n1 < 1) return null
    val vx = StatTests.asDouble(popVarX.eval(null))
    val vy = StatTests.asDouble(popVarY.eval(null))
    val conf = StatTests.asDouble(confidence.eval(null))
    val m0 = buf(1) / n0
    val m1 = buf(3) / n1
    val se = math.sqrt(vx / n0 + vy / n1)
    if (se == 0.0) return null
    val z = (m0 - m1) / se
    val p = StatTests.zTwoSidedP(z)
    val zc = StatTests.probitTwoSided(conf)
    new GenericInternalRow(Array[Any](
      z, p, (m0 - m1) - zc * se, (m0 - m1) + zc * se))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): MeanZTestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MeanZTestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MeanZTestAgg =
    copy(popVarX = c(0), popVarY = c(1), confidence = c(2),
      value = c(3), idx = c(4))
}
