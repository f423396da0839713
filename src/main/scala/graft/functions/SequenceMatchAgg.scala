package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `sequenceMatch(pattern)(timestamp, cond1, ...)` /
  * `sequenceCount(pattern)(...)` as registered aggregates (the
  * operator-level twins live in operators/Funnel.scala; these make the
  * pasted parameterized form run through the `f(params)(args)` shim).
  *
  * Semantics per the CH docs: rows matching at least one condition
  * enter the event chain ordered by timestamp; `(?N)` in the pattern
  * matches an event satisfying condition N, `.` matches exactly one
  * event, `.*` any number. `sequenceMatch` asks whether the chain
  * contains the pattern anywhere; `sequenceCount` counts
  * non-overlapping matches, resuming after each EARLIEST completed
  * match (so `.*` translates to a reluctant quantifier — a greedy scan
  * would swallow later matches and undercount).
  *
  * Implementation: each stored event is one char whose low bits are
  * the bitmask of satisfied conditions (capped at 8 conditions so the
  * alphabet stays 256 chars); `(?N)` compiles to the character class
  * of all masks with bit N set. The buffer is (micros, mask) pairs —
  * map-side combinable, sorted once at eval. The `(?t op n)`
  * time-distance assertions are rejected at registration with a clear
  * message rather than approximated.
  *
  * Same-timestamp events: CH leaves their order undefined; we sort by
  * (time, mask) so results are deterministic and partitioning-proof.
  */
case class SequenceMatchAgg(
    pattern: Expression,
    ts: Expression,
    conds: Seq[Expression],
    count: Boolean,
    events: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {

  require(conds.nonEmpty && conds.size <= 8,
    "sequenceMatch/sequenceCount take 1..8 conditions")

  // LAZY: the constructor must not eval — Spark's plan pretty-printer
  // copies the node with PrettyAttribute (Unevaluable) children, and
  // a copy() re-runs the constructor (round-18 lesson: a scalar
  // subquery under an outer aggregate pretty-prints its select items
  // and died here). Validation runs in checkInputDataTypes, which
  // only ever sees the real resolved node.
  private lazy val patternStr: String = pattern.eval(null) match {
    case s if s != null => s.toString
    case _ => throw new IllegalArgumentException(
      "sequenceMatch/sequenceCount need a literal pattern string")
  }

  /** CH pattern → Java regex over the mask alphabet (chars 0..255). */
  private lazy val regex: java.util.regex.Pattern = {
    val sb = new StringBuilder
    var i = 0
    while (i < patternStr.length) {
      val c = patternStr.charAt(i)
      if (c == '(' && i + 2 < patternStr.length &&
        patternStr.charAt(i + 1) == '?' &&
        patternStr.charAt(i + 2).isDigit) {
        val close = patternStr.indexOf(')', i)
        if (close < 0) throw new IllegalArgumentException(
          s"unbalanced parens in sequence pattern '$patternStr'")
        val n = patternStr.substring(i + 2, close).toInt
        if (n < 1 || n > conds.size) throw new IllegalArgumentException(
          s"pattern references condition $n but only ${conds.size} given")
        // every mask char with bit n-1 set; a capturing group so
        // sequenceMatchEvents can read back each (?N)'s position
        val cls = (0 until 256).filter(m => (m & (1 << (n - 1))) != 0)
          .map(m => f"\\x$m%02x").mkString
        sb.append("([").append(cls).append("])")
        i = close + 1
      } else if (c == '.' && i + 1 < patternStr.length &&
        patternStr.charAt(i + 1) == '*') {
        // reluctant: earliest completion, the CH resume point
        sb.append(".*?")
        i += 2
      } else if (c == '.') {
        sb.append('.')
        i += 1
      } else throw new IllegalArgumentException(
        s"unsupported sequence pattern element '$c' in '$patternStr' " +
          "(supported: (?N), ., .*)")
    }
    java.util.regex.Pattern.compile(sb.toString,
      java.util.regex.Pattern.DOTALL)
  }

  override def children: Seq[Expression] = pattern +: ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (events) ArrayType(ts.dataType, containsNull = false)
    else if (count) LongType
    else BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!pattern.foldable)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName needs a literal pattern string")
    // patternStr itself throws on a foldable-but-NULL pattern
    // (sequenceMatch(NULL)(...)): surface it as a TypeCheckFailure
    // like every other validation path, not an escaping exception
    try {
      if (patternStr.contains("(?t"))
        return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName time assertions (?t...) are " +
            "not supported; filter on the timestamp column instead")
      regex
    } catch {
      case e: IllegalArgumentException =>
        return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(e.getMessage)
    }
    val ok = (ts.dataType == TimestampType ||
      ts.dataType == TimestampNTZType || ts.dataType == LongType ||
      ts.dataType == IntegerType) &&
      conds.forall(_.dataType == BooleanType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "sequenceMatch/sequenceCount expect (timestamp|numeric ts, " +
        "boolean conds...), got " +
        (ts +: conds).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int)],
      input: InternalRow): ArrayBuffer[(Long, Int)] = {
    val t = ts.eval(input)
    if (t != null) {
      val tu = t match {
        case l: Long => l
        case i: Int => i.toLong
        case other => other.asInstanceOf[Long]
      }
      var mask = 0
      var i = 0
      while (i < conds.size) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) mask |= 1 << i
        i += 1
      }
      if (mask != 0) buf += ((tu, mask)) // non-matching rows are skipped
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Int)],
      other: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    val sorted = buf.sortBy(identity)
    val sb = new java.lang.StringBuilder(sorted.size)
    sorted.foreach { case (_, m) => sb.append(m.toChar) }
    val m = regex.matcher(sb)
    if (events) {
      // timestamps of the FIRST match's (?N) events, in pattern order
      // (CH: sequenceMatchEvents returns the matched chain's event
      // timestamps); no match -> empty array
      val out = ArrayBuffer.empty[Any]
      if (m.find()) {
        var g = 1
        while (g <= m.groupCount()) {
          if (m.start(g) >= 0) {
            val t = sorted(m.start(g))._1
            out += (ts.dataType match {
              case IntegerType => t.toInt
              case _ => t
            })
          }
          g += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    } else if (count) {
      var n = 0L
      while (m.find()) n += 1
      n
    } else m.find()
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, mask) => out.writeLong(t); out.writeInt(mask) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Long, Int)]
    var i = 0
    while (i < n) {
      val t = in.readLong()
      val mask = in.readInt()
      buf += ((t, mask))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceMatchAgg =
    copy(pattern = newChildren.head, ts = newChildren(1),
      conds = newChildren.drop(2))
  override def prettyName: String =
    if (events) "sequenceMatchEvents"
    else if (count) "sequenceCount"
    else "sequenceMatch"
}
