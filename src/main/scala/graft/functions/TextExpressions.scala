package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Trigram statistics over a token array as ONE native pass:
  * `struct(n_trigrams, n_distinct)` from a single loop with a hash set.
  *
  * The portable formulation (`transform(sequence(...), slice...)` +
  * `array_distinct`) runs as an interpreted higher-order-function tree —
  * measured ~2 ms/row, and being non-codegen it is re-evaluated per
  * referencing column with no subexpression elimination. This expression
  * participates in whole-stage codegen, so CSE evaluates it once per row
  * and the repetition score stays a narrow scan-speed operator
  * (SURVEY §2 D19). Semantics match the DuckDB oracle's list form
  * exactly: trigrams are space-joined token windows.
  */
case class TrigramStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TrigramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramStats =
    copy(child = newChild)
}

object TrigramStats {

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n < 3) return new GenericInternalRow(Array[Any](0L, 0L))
    val tokens = new Array[String](n)
    var i = 0
    while (i < n) { tokens(i) = toks.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.HashSet[String](math.max(4, (n - 2) * 2))
    i = 0
    while (i < n - 2) {
      seen.add(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any]((n - 2).toLong, seen.size.toLong))
  }
}

/** Character-level Shannon entropy (base 2) of a string in one native
  * pass — the CCNet-adjacent "is this natural text or noise" quality
  * signal (SURVEY §2 D28): random bytes and repeated-char spam sit at
  * the distribution's tails while natural language clusters mid-range.
  * Counts Unicode code points; terms sum in sorted-count order so the
  * double is deterministic (and matches an oracle that groups
  * per-character counts, at any rounding ≥ ~12 significant digits).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.HashMap[Int, Long]()
    var i = 0
    var total = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      total += 1
      i += Character.charCount(cp)
    }
    val cs = new Array[Long](counts.size)
    val it = counts.values.iterator()
    var j = 0
    while (it.hasNext) { cs(j) = it.next(); j += 1 }
    java.util.Arrays.sort(cs)
    var acc = 0.0
    val n = total.toDouble
    j = 0
    while (j < cs.length) {
      val p = cs(j) / n
      acc -= p * (math.log(p) / math.log(2.0))
      j += 1
    }
    acc
  }
}

/** ClickHouse `ngramDistance(a, b)`: 4-gram multiset distance in
  * [0, 1] — |A Δ B| / (|A| + |B|) over the two strings' character
  * 4-grams counted with multiplicity (0 for two empty/short strings,
  * 1 for disjoint), so strings with repeated 4-grams score like the
  * reference's count-based formula rather than a distinct-set
  * approximation. Grams are over UTF-16 code units (the reference
  * operates on bytes/codepoints; values can differ for
  * supplementary-plane characters). The fuzzy string-match primitive
  * behind "did you mean" style lookups; one native pass per pair, no
  * explode. */
case class NgramDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramDistance.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NgramDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramDistance =
    copy(left = newLeft, right = newRight)
}

object NgramDistance {

  private def grams(s: String): java.util.HashMap[String, java.lang.Integer] = {
    val out = new java.util.HashMap[String, java.lang.Integer]()
    var i = 0
    while (i + 4 <= s.length) {
      out.merge(s.substring(i, i + 4), java.lang.Integer.valueOf(1),
        (x, y) => java.lang.Integer.valueOf(x.intValue() + y.intValue()))
      i += 1
    }
    out
  }

  def compute(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val na = math.max(0, sa.length - 3)
    val nb = math.max(0, sb.length - 3)
    val total = na + nb
    if (total == 0) return 0.0
    val ga = grams(sa)
    val gb = grams(sb)
    var inter = 0
    val it = ga.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cb = gb.get(e.getKey)
      if (cb != null) inter += math.min(e.getValue, cb.intValue())
    }
    (total - 2 * inter).toDouble / total
  }
}

/** Int8 quantize + reconstruct + score in ONE fused native loop:
  * `struct(abs_err, cos)` for a vector against per-dimension min/max
  * ranges. The arithmetic is exactly the portable formulation the
  * DuckDB oracle runs (`floor((x-mn)·255/(mx-mn)+0.5)` clamped, then
  * `mn + code·(mx-mn)/255`) — IEEE doubles in the same operation
  * order, so results match bit-for-bit. Exists because the HOF chain
  * (two transforms + zip_with + aggregate, all interpreted) measured
  * ~1 ms/row; this runs inside whole-stage codegen. */
case class QuantRecon(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("abs_err", DoubleType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))

  override def nullSafeEval(v: Any, mns: Any, mxs: Any): Any =
    QuantRecon.compute(v.asInstanceOf[ArrayData],
      mns.asInstanceOf[ArrayData], mxs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, mns, mxs) =>
      s"graft.functions.QuantRecon.compute($v, $mns, $mxs)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): QuantRecon =
    copy(first = f, second = s, third = t)
}

/** Quantize-then-dequantize a vector in one native pass: the int8
  * round trip `mn + code·(mx-mn)/255` with the same clamped floor
  * arithmetic as [[QuantRecon]], returning the reconstructed vector —
  * what a memory-lean ANN index actually searches over. Bit-identical
  * to the portable formulation the DuckDB oracle runs. */
case class QuantDequant(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, mns: Any, mxs: Any): Any =
    QuantDequant.compute(v.asInstanceOf[ArrayData],
      mns.asInstanceOf[ArrayData], mxs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, mns, mxs) =>
      s"graft.functions.QuantDequant.compute($v, $mns, $mxs)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): QuantDequant =
    copy(first = f, second = s, third = t)
}

object QuantDequant {

  def compute(v: ArrayData, mns: ArrayData, mxs: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var d = 0
    while (d < n) {
      val x = v.getDouble(d)
      val mn = mns.getDouble(d)
      val mx = mxs.getDouble(d)
      out(d) =
        if (mx == mn) mn
        else {
          val code = math.min(255.0,
            math.max(0.0, math.floor((x - mn) * 255.0 / (mx - mn) + 0.5)))
          mn + code * (mx - mn) / 255.0
        }
      d += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Count regex matches in a string WITHOUT materializing the match
  * array: `regexp_extract_all(...)` allocates one UTF8String per hit
  * just so `size()` can count them — measured as a 3× wall-time
  * regression on the BPE token count at sf0.1. This expression runs
  * the same `java.util.regex` matcher Spark's regexp family uses (so
  * counts are identical to the `size(regexp_extract_all(...))`
  * formulation and to the DuckDB oracle) but only increments a
  * counter. The pattern is compiled once per codegen'd operator when
  * the pattern operand is a literal — the hot path touches no
  * allocation beyond the matcher. */
case class CountMatches(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType

  @transient private lazy val compiledOrNull: java.util.regex.Pattern =
    right match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
            p: org.apache.spark.unsafe.types.UTF8String, StringType) if p != null =>
        java.util.regex.Pattern.compile(p.toString)
      case _ => null
    }

  override def nullSafeEval(s: Any, p: Any): Any = {
    val pat =
      if (compiledOrNull != null) compiledOrNull
      else java.util.regex.Pattern.compile(p.toString)
    CountMatches.count(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], pat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patCls = classOf[java.util.regex.Pattern].getName
    val patRef = ctx.addReferenceObj("cmPattern", compiledOrNull, patCls)
    val pat = ctx.freshName("cmPat") // unique per instance: two
    // CountMatches in one codegen scope must not collide
    nullSafeCodeGen(ctx, ev, (s, p) =>
      s"""
         |$patCls $pat = $patRef != null ? $patRef : $patCls.compile($p.toString());
         |${ev.value} = graft.functions.CountMatches.count($s, $pat);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMatches =
    copy(left = newLeft, right = newRight)
}

object CountMatches {

  def count(s: org.apache.spark.unsafe.types.UTF8String,
      pat: java.util.regex.Pattern): Long = {
    val m = pat.matcher(s.toString)
    var c = 0L
    while (m.find()) c += 1
    c
  }
}

/** ClickHouse replaceRegexpOne / replaceOne: replace only the FIRST
  * occurrence (Spark's regexp_replace has no first-only form).
  * `literalMatch = true` treats the pattern AND replacement as plain
  * text (replaceOne). The replacement string follows Java's `$N`
  * backreference syntax — the CHFunctions builder translates CH's
  * `\N` spellings on literal replacements before constructing this. */
case class RegexpReplaceOne(subject: Expression, pattern: Expression,
    rep: Expression, literalMatch: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {

  override def first: Expression = subject
  override def second: Expression = pattern
  override def third: Expression = rep
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (literalMatch) "replaceOne" else "replaceRegexpOne"

  @transient private lazy val compiledOrNull: java.util.regex.Pattern =
    pattern match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
            p: org.apache.spark.unsafe.types.UTF8String, StringType)
          if p != null =>
        RegexpReplaceOne.compile(p.toString, literalMatch)
      case _ => null
    }

  override def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val pat =
      if (compiledOrNull != null) compiledOrNull
      else RegexpReplaceOne.compile(p.toString, literalMatch)
    RegexpReplaceOne.replaceFirst(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      pat, r.toString, literalMatch)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val patCls = classOf[java.util.regex.Pattern].getName
    val patRef = ctx.addReferenceObj("rroPattern", compiledOrNull, patCls)
    val pat = ctx.freshName("rroPat")
    val lit = if (literalMatch) "true" else "false"
    nullSafeCodeGen(ctx, ev, (s, p, r) =>
      s"""
         |$patCls $pat = $patRef != null
         |  ? $patRef : graft.functions.RegexpReplaceOne.compile($p.toString(), $lit);
         |${ev.value} = graft.functions.RegexpReplaceOne.replaceFirst($s, $pat, $r.toString(), $lit);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RegexpReplaceOne =
    copy(subject = newFirst, pattern = newSecond, rep = newThird)
}

object RegexpReplaceOne {

  def compile(p: String, literalMatch: Boolean): java.util.regex.Pattern =
    if (literalMatch)
      java.util.regex.Pattern.compile(p, java.util.regex.Pattern.LITERAL)
    else java.util.regex.Pattern.compile(p)

  def replaceFirst(s: org.apache.spark.unsafe.types.UTF8String,
      pat: java.util.regex.Pattern, rep: String,
      literalMatch: Boolean): org.apache.spark.unsafe.types.UTF8String = {
    val r = if (literalMatch)
      java.util.regex.Matcher.quoteReplacement(rep) else rep
    org.apache.spark.unsafe.types.UTF8String.fromString(
      pat.matcher(s.toString).replaceFirst(r))
  }
}

object QuantRecon {

  def compute(v: ArrayData, mns: ArrayData, mxs: ArrayData): InternalRow = {
    val n = v.numElements()
    var errSum = 0.0; var dot = 0.0; var xx = 0.0; var yy = 0.0
    var d = 0
    while (d < n) {
      val x = v.getDouble(d)
      val mn = mns.getDouble(d)
      val mx = mxs.getDouble(d)
      val code: Int =
        if (mx == mn) 0
        else math.min(255.0,
          math.max(0.0, math.floor((x - mn) * 255.0 / (mx - mn) + 0.5))).toInt
      val dq = mn + code * (mx - mn) / 255.0
      errSum += math.abs(x - dq)
      dot += x * dq; xx += x * x; yy += dq * dq
      d += 1
    }
    val cos = if (xx == 0.0 || yy == 0.0) 0.0 else dot / math.sqrt(xx * yy)
    new GenericInternalRow(Array[Any](if (n == 0) 0.0 else errSum / n, cos))
  }
}

/** spanKeys(toks, len): one 64-bit key per `len`-token span of `toks`,
  * computed in a single pass — each token is xxhash64'd once, and span
  * j's key is the rotate-xor combine of token hashes j..j+len-1. An
  * array shorter than `len` yields ONE whole-array key (the 1-based
  * `slice(toks, i, len)` semantics of the SQL formulation it
  * replaces). Interpreted higher-order lambdas would pay per-element
  * Expression dispatch for the same arithmetic; this is the
  * boilerplate pass's hot loop, where a key collision can only ADD a
  * candidate (the exact string check downstream kills it), so the
  * combine only has to be cheap and well-mixed, not cryptographic. */
case class SpanKeys(child: Expression, spanLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(spanLen >= 1, s"spanKeys needs len >= 1, got $spanLen")

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SpanKeys.compute(v.asInstanceOf[ArrayData], spanLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanKeys.compute($c, $spanLen);")

  override protected def withNewChildInternal(newChild: Expression): SpanKeys =
    copy(child = newChild)
}

object SpanKeys {

  def compute(arr: ArrayData, len: Int): ArrayData = {
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      th(i) =
        if (u == null) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(u, 42L)
      i += 1
    }
    val k = math.max(n - len + 1, 1)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var a = -3750763034362895579L
      var e = j
      val end = math.min(j + len, n)
      while (e < end) { a = java.lang.Long.rotateLeft(a, 5) ^ th(e); e += 1 }
      out(j) = a
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** ClickHouse `ngramSearch(haystack, needle)` — asymmetric 4-gram
  * containment in [0, 1]: the share of the needle's 4-gram multiset
  * found in the haystack (1 = fully contained, 0 = disjoint or an
  * empty/short needle). Same gram basis as [[NgramDistance]]. */
case class NgramSearch(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramSearch.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NgramSearch.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramSearch =
    copy(left = newLeft, right = newRight)
}

object NgramSearch {
  def compute(hay: org.apache.spark.unsafe.types.UTF8String,
      needle: org.apache.spark.unsafe.types.UTF8String): Double = {
    val sh = hay.toString
    val sn = needle.toString
    val nn = math.max(0, sn.length - 3)
    if (nn == 0) return 0.0
    val gh = new java.util.HashMap[String, java.lang.Integer]()
    var i = 0
    while (i + 4 <= sh.length) {
      gh.merge(sh.substring(i, i + 4), java.lang.Integer.valueOf(1),
        (x, y) => java.lang.Integer.valueOf(x.intValue() + y.intValue()))
      i += 1
    }
    var inter = 0
    i = 0
    while (i + 4 <= sn.length) {
      val g = sn.substring(i, i + 4)
      val c = gh.get(g)
      if (c != null && c.intValue() > 0) {
        inter += 1
        gh.put(g, java.lang.Integer.valueOf(c.intValue() - 1))
      }
      i += 1
    }
    inter.toDouble / nn
  }
}

/** ClickHouse `tupleNames(t)` — the tuple's field names as an array of
  * strings. The names are a property of the RESOLVED child type, so
  * the result is one constant array per plan (no per-row work beyond
  * returning it). */
case class TupleNames(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tupleNames expects a tuple/struct argument, got ${other.sql}")
    }

  @transient private lazy val names: ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      child.dataType.asInstanceOf[StructType].fieldNames
        .map(org.apache.spark.unsafe.types.UTF8String.fromString))

  override def eval(input: InternalRow): Any = names

  override protected def withNewChildInternal(newChild: Expression): TupleNames =
    copy(child = newChild)
}

/** ClickHouse `JSONExtractArrayRaw(json[, key])` — each element of the
  * (optionally key-addressed) JSON array as its own raw JSON text
  * (strings KEEP their quotes, nested objects come back whole).
  * Jackson re-serializes compactly, so inter-element whitespace from
  * the source is not preserved — the documented deviation. NULL for
  * invalid JSON / missing key / non-array, like CH's [] we return
  * empty where CH does. */
case class JsonArrayRaw(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size == 1 || children.size == 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"JSONExtractArrayRaw takes (json[, key]), got ${children.size} args")

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val key =
      if (children.size > 1) {
        val k = children(1).eval(input)
        if (k == null) return null
        k.toString
      } else null
    JsonArrayRaw.extract(j.toString, key)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsonArrayRaw =
    copy(children = newChildren)
}

object JsonArrayRaw {
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  def extract(json: String, key: String): ArrayData = try {
    var node = mapper.readTree(json)
    if (key != null) node = node.get(key)
    if (node == null || !node.isArray) return null
    val out = new Array[Any](node.size())
    var i = 0
    while (i < node.size()) {
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromString(node.get(i).toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  } catch { case _: Exception => null }
}

/** tokenSetCount(arr, 'a,b,c'): how many elements of `arr` are in the
  * comma-separated literal set — the native one-pass form of
  * `size(filter(arr, t -> t IN (...)))` (r20). Spark higher-order
  * functions evaluate their lambda INTERPRETED per element, and the
  * language-ID/quality operators ran four of them per row; this is one
  * hash-set probe per token inside codegen. Identical semantics: null
  * array → null, null elements never match, binary string equality. */
case class TokenSetCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "tokenSetCount"

  @transient private lazy val setOrNull: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] =
    right match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String, StringType) if s != null =>
        TokenSetCount.parse(s)
      case _ => null
    }

  override def nullSafeEval(arr: Any, set: Any): Any = {
    val s =
      if (setOrNull != null) setOrNull
      else TokenSetCount.parse(set.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    TokenSetCount.count(arr.asInstanceOf[ArrayData], s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setCls = classOf[java.util.HashSet[_]].getName
    val setRef = ctx.addReferenceObj("tscSet", setOrNull, setCls)
    val set = ctx.freshName("tscSet")
    nullSafeCodeGen(ctx, ev, (arr, s) =>
      s"""
         |$setCls $set = $setRef != null ? $setRef
         |  : graft.functions.TokenSetCount.parse($s);
         |${ev.value} = graft.functions.TokenSetCount.count($arr, $set);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSetCount =
    copy(left = newLeft, right = newRight)
}

object TokenSetCount {

  def parse(csv: org.apache.spark.unsafe.types.UTF8String)
      : java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val out = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    csv.toString.split(',').foreach(t =>
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    out
  }

  def count(arr: ArrayData,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** wordShingles(arr, n): the word n-gram shingle array — the native
  * one-pass form of
  * `transform(sequence(1, greatest(size(arr)-(n-1), 1)), i ->
  *    concat_ws(' ', slice(arr, i, n)))` (r20). The HOF formulation runs
  * an interpreted lambda per shingle and allocates a slice array plus a
  * concat per call; this emits the same strings in one loop. Exact
  * semantics match, including the degenerate cases the old expression
  * produced: fewer than n tokens yield ONE shingle of all tokens, an
  * empty array yields [""], and null elements are skipped by the join
  * (concat_ws's rule). */
case class WordShingles(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordShingles"

  override def nullSafeEval(arr: Any, n: Any): Any =
    WordShingles.compute(arr.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) =>
      s"${ev.value} = graft.functions.WordShingles.compute($arr, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

object WordShingles {

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    val count = math.max(total - (n - 1), 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, total)
      // UTF8String.concatWs is the builtin concat_ws kernel: one output
      // byte array straight from the token bytes, null inputs skipped —
      // the former StringBuilder path decoded every token to UTF-16 and
      // re-encoded the shingle, twice the bytes touched per shingle
      // (r21; same strings bit-for-bit)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** rollingMd5(arr): the order-sensitive rolling fingerprint
  * `aggregate(arr, '', (h, t) -> md5(concat(h, t)))` as one native loop
  * (r20). The HOF fold ran interpreted per token, re-encoding the
  * 32-char running hex through UTF8String concat and Spark's md5
  * expression each step; this keeps the digest and hex table local.
  * Byte-identical chain: each step hashes the UTF-8 bytes of the
  * previous hex rendering followed by the token. Null elements follow
  * concat's rule (null token nulls the whole fold — concat(h, NULL) is
  * NULL and md5(NULL) is NULL, which then propagates). */
case class RollingMd5(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "rollingMd5"

  override def nullSafeEval(input: Any): Any =
    RollingMd5.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.RollingMd5.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): RollingMd5 =
    copy(child = newChild)
}

object RollingMd5 {

  private val digestPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val md = digestPool.get()
    var h = ""
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null // concat(h, NULL) -> NULL -> md5 NULL
      md.reset()
      md.update(h.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(arr.getUTF8String(i).getBytes)
      val d = md.digest()
      val out = new Array[Char](32)
      var k = 0
      while (k < 16) {
        out(2 * k) = hexChars((d(k) >> 4) & 0xf)
        out(2 * k + 1) = hexChars(d(k) & 0xf)
        k += 1
      }
      h = new String(out)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(h)
  }
}

/** collapseSpaces(s): byte-exact `regexp_replace(s, ' +', ' ')` — every
  * maximal run of ASCII spaces becomes one space — as a single byte
  * pass with no regex engine and no copy when no run exists (r21).
  * This is the normalization step in front of the whole dedup family
  * (and text_fingerprint), where the java.util.regex Matcher was a
  * measurable slice of the corpus scan. Only 0x20 collapses, exactly
  * like the pattern it replaces; multi-byte code points pass through
  * untouched (no UTF-8 continuation byte equals 0x20). */
case class CollapseSpaces(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "collapseSpaces"

  override def nullSafeEval(input: Any): Any =
    CollapseSpaces.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CollapseSpaces.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CollapseSpaces =
    copy(child = newChild)
}

object CollapseSpaces {

  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val b = s.getBytes
    val n = b.length
    // fast path: no two adjacent spaces -> the input IS the output
    var i = 1
    var run = false
    while (i < n && !run) {
      if (b(i) == 0x20 && b(i - 1) == 0x20) run = true
      i += 1
    }
    if (!run) return s
    val out = new Array[Byte](n)
    var w = 0
    i = 0
    while (i < n) {
      val c = b(i)
      if (c != 0x20 || w == 0 || out(w - 1) != 0x20) { out(w) = c; w += 1 }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out, 0, w)
  }
}

/** spaceSplit(s): byte-exact `split(s, ' ')` (single-space pattern,
  * Spark's default limit -1 — trailing empty strings KEPT) without the
  * regex engine: n spaces yield n+1 tokens sliced between them, so
  * "a  b" gives ["a", "", "b"] and "" gives [""], exactly like the
  * builtin (r21). Tokenization feeds every dedup/text operator's
  * per-row pipeline, one evaluation per corpus row. */
case class SpaceSplit(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "spaceSplit"

  override def nullSafeEval(input: Any): Any =
    SpaceSplit.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpaceSplit.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SpaceSplit =
    copy(child = newChild)
}

object SpaceSplit {

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var count = 1
    var i = 0
    while (i < n) { if (b(i) == 0x20) count += 1; i += 1 }
    val out = new Array[Any](count)
    var t = 0
    var start = 0
    i = 0
    while (i < n) {
      if (b(i) == 0x20) {
        out(t) = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(b, start, i - start)
        t += 1
        start = i + 1
      }
      i += 1
    }
    out(t) = org.apache.spark.unsafe.types.UTF8String
      .fromBytes(b, start, n - start)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
