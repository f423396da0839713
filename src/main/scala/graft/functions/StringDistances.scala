package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact string-distance batteries for the CH dialect
  * (reference: ClickHouse string-similarity functions —
  * byteHammingDistance, damerauLevenshteinDistance, jaroSimilarity,
  * jaroWinklerSimilarity, stringJaccardIndex). ClickHouse computes all
  * of these over BYTES, not code points, so the helpers run on the
  * UTF8String byte arrays directly; on ASCII data they agree with
  * character-based engines (what lets DuckDB replay the oracle).
  *
  * Static single-pass/DP methods so codegen emits one call the JIT
  * compiles; each expression is a thin codegen'd wrapper. */
object StringDistanceOps {

  /** Differing bytes over the common prefix plus the length gap. */
  def byteHamming(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes
    val y = b.getBytes
    val common = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length)
    var i = 0
    while (i < common) {
      if (x(i) != y(i)) d += 1
      i += 1
    }
    d
  }

  /** Damerau-Levenshtein with adjacent transpositions (the optimal
    * string alignment form: each substring transposed at most once —
    * the standard library behavior, and DuckDB's). */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes
    val y = b.getBytes
    val n = x.length
    val m = y.length
    if (n == 0) return m
    if (m == 0) return n
    var prev2: Array[Int] = null
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (x(i - 1) == y(j - 1)) 0 else 1
        var best = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        if (i > 1 && j > 1 && x(i - 1) == y(j - 2) && x(i - 2) == y(j - 1))
          best = math.min(best, prev2(j - 2) + 1)
        cur(j) = best
        j += 1
      }
      val t = prev2
      prev2 = prev
      prev = cur
      cur = if (t == null) new Array[Int](m + 1) else t
      i += 1
    }
    prev(m)
  }

  /** Standard Jaro similarity in [0, 1]; both-empty → 1, one-empty →
    * 0 (ClickHouse and DuckDB agree on the convention). */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val n = x.length
    val m = y.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val xm = new Array[Boolean](n)
    val ym = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!ym(j) && x(i) == y(j)) {
          xm(i) = true; ym(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (xm(i)) {
        while (!ym(k)) k += 1
        if (x(i) != y(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
  }

  /** Jaro-Winkler with the standard 0.1 prefix scale over at most 4
    * common leading bytes (ClickHouse defaults). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    val x = a.getBytes
    val y = b.getBytes
    val maxPrefix = math.min(4, math.min(x.length, y.length))
    var l = 0
    while (l < maxPrefix && x(l) == y(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Jaccard index of the two strings' BYTE sets; both-empty → 0,
    * like ClickHouse. */
  def jaccardBytes(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val inA = new Array[Boolean](256)
    val inB = new Array[Boolean](256)
    var i = 0
    while (i < x.length) { inA(x(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < y.length) { inB(y(i) & 0xff) = true; i += 1 }
    var inter = 0
    var union = 0
    i = 0
    while (i < 256) {
      if (inA(i) && inB(i)) inter += 1
      if (inA(i) || inB(i)) union += 1
      i += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

private[functions] abstract class StringDistanceExpr
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  /** The [[StringDistanceOps]] static method name. */
  protected def op: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.StringDistanceOps.$op($x, $y)")
}

/** `byteHammingDistance(a, b)` (ClickHouse byteHammingDistance). */
case class ByteHammingDistance(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = IntegerType
  override protected def op: String = "byteHamming"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceOps.byteHamming(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteHammingDistance =
    copy(left = newLeft, right = newRight)
}

/** `damerauLevenshteinDistance(a, b)`. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = IntegerType
  override protected def op: String = "damerauLevenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceOps.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** `jaroSimilarity(a, b)`. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def op: String = "jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceOps.jaro(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `jaroWinklerSimilarity(a, b)`. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def op: String = "jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceOps.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `stringJaccardIndex(a, b)`: Jaccard over byte sets. */
case class StringJaccardIndex(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def op: String = "jaccardBytes"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceOps.jaccardBytes(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringJaccardIndex =
    copy(left = newLeft, right = newRight)
}
