package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** ClickHouse's heavier random-distribution family — randPoisson,
  * randBinomial, randNegativeBinomial, randChiSquared, randStudentT,
  * randFisherF, randLogNormal — as ONE native Nondeterministic
  * expression with textbook samplers (Knuth's product method for
  * Poisson, Marsaglia–Tsang for Gamma, normal approximations past the
  * loop-friendly ranges). Parameters evaluate per row, so a column-
  * valued lambda works like CH's. Each partition seeds independently
  * — the same contract as Spark's own Rand — and large-n/λ cases cut
  * over to the CLT approximation so a pathological parameter cannot
  * degenerate into an unbounded per-row loop at 100 TB.
  *
  * Reference: mcp_server.py:433-459 (arbitrary pasted SELECT);
  * distributions per the public definitions.
  */
case class RandDist(kind: String, args: Seq[Expression])
    extends Expression with Nondeterministic with CodegenFallback {

  override def children: Seq[Expression] = args
  override def nullable: Boolean = args.exists(_.nullable)
  override def dataType: DataType = kind match {
    case "poisson" | "binomial" | "negativeBinomial" => LongType
    case _ => DoubleType
  }
  override def prettyName: String =
    "rand" + kind.capitalize

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    // distinct stream per partition; fresh per query like CH's rand*
    rng = new java.util.Random(
      java.util.concurrent.ThreadLocalRandom.current().nextLong() ^
        (partitionIndex.toLong * 0x9E3779B97F4A7C15L))

  override protected def evalInternal(input: InternalRow): Any = {
    val xs = new Array[Double](args.length)
    var i = 0
    while (i < args.length) {
      args(i).eval(input) match {
        case null => return null
        case d: org.apache.spark.sql.types.Decimal => xs(i) = d.toDouble
        case n: Number => xs(i) = n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"$prettyName: numeric parameter expected, got $other")
      }
      i += 1
    }
    kind match {
      case "poisson" => poisson(xs(0))
      case "binomial" => binomial(xs(0).toLong, xs(1))
      case "negativeBinomial" => negBinomial(xs(0).toLong, xs(1))
      case "chiSquared" => 2.0 * gamma(xs(0) / 2.0)
      case "studentT" =>
        val nu = xs(0)
        rng.nextGaussian() / math.sqrt(2.0 * gamma(nu / 2.0) / nu)
      case "fisherF" =>
        val (d1, d2) = (xs(0), xs(1))
        (2.0 * gamma(d1 / 2.0) / d1) / (2.0 * gamma(d2 / 2.0) / d2)
      case "logNormal" => math.exp(xs(0) + xs(1) * rng.nextGaussian())
      case other => throw new IllegalStateException(s"unknown dist $other")
    }
  }

  /** Knuth's product method below λ=30; CLT approximation above
    * (bounded work per row regardless of the parameter). */
  private def poisson(lambda: Double): Long = {
    if (lambda <= 0) return 0L
    if (lambda < 30.0) {
      val l = math.exp(-lambda)
      var k = 0L
      var p = 1.0
      do { k += 1; p *= rng.nextDouble() } while (p > l)
      k - 1
    } else {
      math.max(0L,
        math.round(lambda + math.sqrt(lambda) * rng.nextGaussian()))
    }
  }

  private def binomial(n: Long, p: Double): Long = {
    if (n <= 0 || p <= 0) return 0L
    if (p >= 1) return n
    if (n <= 1024) {
      var c = 0L
      var i = 0L
      while (i < n) { if (rng.nextDouble() < p) c += 1; i += 1 }
      c
    } else {
      val mu = n * p
      val sd = math.sqrt(n * p * (1 - p))
      math.min(n, math.max(0L, math.round(mu + sd * rng.nextGaussian())))
    }
  }

  /** Failures before the r-th success: Σ of r geometric draws. */
  private def negBinomial(r: Long, p: Double): Long = {
    if (r <= 0 || p >= 1) return 0L
    if (p <= 0) throw new IllegalArgumentException(
      "randNegativeBinomial: success probability must be > 0")
    val lq = math.log1p(-p)
    var sum = 0L
    var i = 0L
    val cap = math.min(r, 4096L) // CLT past the loop-friendly range
    while (i < cap) {
      sum += math.floor(math.log(1.0 - rng.nextDouble()) / lq).toLong
      i += 1
    }
    if (r > cap) {
      val mu = (r - cap) * (1 - p) / p
      val sd = math.sqrt((r - cap) * (1 - p)) / p
      sum += math.max(0L, math.round(mu + sd * rng.nextGaussian()))
    }
    sum
  }

  /** Marsaglia–Tsang (2000) Gamma(shape, 1); shape < 1 via the
    * standard U^(1/α) boost. */
  private def gamma(shape: Double): Double = {
    if (shape <= 0) return 0.0
    if (shape < 1.0)
      return gamma(shape + 1.0) *
        math.pow(rng.nextDouble(), 1.0 / shape)
    val d = shape - 1.0 / 3.0
    val c = 1.0 / math.sqrt(9.0 * d)
    while (true) {
      var x = 0.0
      var v = 0.0
      do {
        x = rng.nextGaussian()
        v = 1.0 + c * x
      } while (v <= 0.0)
      v = v * v * v
      val u = rng.nextDouble()
      if (u < 1.0 - 0.0331 * x * x * x * x) return d * v
      if (math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v))) return d * v
    }
    0.0 // unreachable
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RandDist =
    copy(args = newChildren)
}

/** Time-ordered unique id generators: UUIDv7 (RFC 9562 — 48-bit unix
  * ms, version/variant bits, 74 random bits), ULID (Crockford
  * base32, 48-bit ms + 80 random bits), and Twitter-layout snowflake
  * ids (41-bit ms over the 1288834974657 epoch << 22 | 10-bit machine
  * | 12-bit sequence — the partition index stands in for the machine
  * id, so concurrent tasks never collide, and the per-task sequence
  * disambiguates same-millisecond calls; round-trips through
  * `snowflakeIDToDateTime`). Nondeterministic leafs; ids are
  * generated at eval time like CH's. */
case class GenTimeId(kind: String)
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with Nondeterministic with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType =
    if (kind == "snowflake") org.apache.spark.sql.types.LongType
    else org.apache.spark.sql.types.StringType
  override def prettyName: String = kind match {
    case "ulid" => "generateULID"
    case "snowflake" => "generateSnowflakeID"
    case _ => "generateUUIDv7"
  }

  @transient private var rng: java.util.Random = _
  @transient private var machine: Long = 0L
  @transient private var seq: Long = 0L

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    rng = new java.util.Random(
      java.util.concurrent.ThreadLocalRandom.current().nextLong() ^
        (partitionIndex.toLong * 0x9E3779B97F4A7C15L))
    machine = partitionIndex.toLong & 0x3FFL
    seq = 0L
  }

  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ms = System.currentTimeMillis()
    if (kind == "snowflake") {
      val id = ((ms - 1288834974657L) << 22) | (machine << 12) | (seq & 0xFFFL)
      seq += 1
      return id
    }
    if (kind == "ulid") {
      val alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
      val chars = new Array[Char](26)
      var t = ms
      var i = 9
      while (i >= 0) { chars(i) = alphabet((t & 31).toInt); t >>= 5; i -= 1 }
      var j = 10
      while (j < 26) { chars(j) = alphabet(rng.nextInt(32)); j += 1 }
      org.apache.spark.unsafe.types.UTF8String.fromString(new String(chars))
    } else {
      val hi = (ms << 16) | 0x7000L | (rng.nextInt(1 << 12)).toLong
      val lo = (rng.nextLong() & 0x3FFFFFFFFFFFFFFFL) | 0x8000000000000000L
      val u = new java.util.UUID(hi, lo)
      org.apache.spark.unsafe.types.UTF8String.fromString(u.toString)
    }
  }
}
