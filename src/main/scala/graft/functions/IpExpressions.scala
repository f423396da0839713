package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IPv6 parse/format and family-agnostic CIDR membership as native
  * codegen'd expressions (ClickHouse's IPv6StringToNum /
  * IPv6NumToString / isIPAddressInRange). The address is a 16-byte
  * binary — the same representation ClickHouse's FixedString(16)
  * carries — and formatting follows RFC 5952 (lowercase hex, the
  * leftmost longest zero run ≥ 2 groups compressed, IPv4-mapped
  * addresses printed in `::ffff:a.b.c.d` form). Each direction is one
  * static call inside whole-stage codegen. */
case class Ipv6Parse(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "IPv6StringToNum"

  override def nullSafeEval(s: Any): Any =
    Ipv6Parse.parse(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.Ipv6Parse.parse($s.toString());
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    code
  }

  override protected def withNewChildInternal(c: Expression): Ipv6Parse =
    copy(child = c)
}

object Ipv6Parse {

  /** Full, compressed (`::` once), and trailing-dotted-quad forms;
    * null (not an exception) on anything invalid. */
  def parse(str: String): Array[Byte] = {
    if (str == null) return null
    val s = str.trim
    if (s.length < 2 || s.indexOf(':') < 0) return null
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null
    val (left, right) =
      if (dc >= 0) (s.substring(0, dc), s.substring(dc + 2)) else (s, "")
    val lg = splitGroups(left)
    val rg = splitGroups(right)
    if (lg == null || rg == null) return null
    val groups = new Array[Int](8)
    var n = 0
    // left side: dotted quad only legal as the final part overall,
    // i.e. on the left only when there is no '::' remainder
    var i = 0
    while (i < lg.length) {
      val last = dc < 0 && i == lg.length - 1
      val g = parseGroup(lg(i), last)
      if (g == null) return null
      g.foreach { v => if (n >= 8) return null; groups(n) = v; n += 1 }
      i += 1
    }
    if (dc >= 0) {
      val tail = new Array[Int](8)
      var tn = 0
      var j = 0
      while (j < rg.length) {
        val g = parseGroup(rg(j), j == rg.length - 1)
        if (g == null) return null
        g.foreach { v => if (n + tn >= 8) return null; tail(tn) = v; tn += 1 }
        j += 1
      }
      var k = 0
      while (k < tn) { groups(8 - tn + k) = tail(k); k += 1 }
      n = 8
    } else if (n != 8) return null
    val out = new Array[Byte](16)
    var b = 0
    while (b < 8) {
      out(2 * b) = ((groups(b) >> 8) & 0xff).toByte
      out(2 * b + 1) = (groups(b) & 0xff).toByte
      b += 1
    }
    out
  }

  /** ':'-split that rejects empty segments ('' whole side is fine —
    * that's the '::' edge — but 'a::b:' is not). */
  private def splitGroups(side: String): Array[String] = {
    if (side.isEmpty) return Array.empty
    if (side.startsWith(":") || side.endsWith(":")) return null
    side.split(":", -1)
  }

  /** One group → its 16-bit value(s): 1-4 hex digits, or (when `last`)
    * a dotted quad contributing two groups. */
  private def parseGroup(g: String, last: Boolean): Array[Int] = {
    if (g.isEmpty) return null
    if (last && g.indexOf('.') >= 0) {
      val v4 = parseV4(g)
      if (v4 < 0) return null
      return Array((v4 >>> 16).toInt, (v4 & 0xffff).toInt)
    }
    if (g.length > 4) return null
    var v = 0
    var i = 0
    while (i < g.length) {
      val d = Character.digit(g.charAt(i), 16)
      if (d < 0) return null
      v = (v << 4) | d
      i += 1
    }
    Array(v)
  }

  /** Dotted quad → unsigned value, or -1 if invalid. */
  def parseV4(s: String): Long = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return -1L
    var v = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) return -1L
      var o = 0
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        if (c < '0' || c > '9') return -1L
        o = o * 10 + (c - '0')
        j += 1
      }
      if (o > 255) return -1L
      v = (v << 8) | o
      i += 1
    }
    v
  }
}

/** Dotted-quad render of a UInt32 address carried in Long — the
  * native one-pass twin of the former concat_ws/shift/cast
  * composition (per-row on the 15M-row sf1 fingerprint queries).
  * Octet extraction is bit-identical to the composed form:
  * `(v >> s) & 255` on the raw long, sign-extension and all, so
  * wrapped/overflowed inputs render exactly as before. */
case class Ipv4Format(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "IPv4NumToString"

  override def nullSafeEval(v: Any): Any =
    Ipv4Format.format(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Ipv4Format.format($v)")

  override protected def withNewChildInternal(c: Expression): Ipv4Format =
    copy(child = c)
}

object Ipv4Format {
  def format(v: Long): UTF8String = {
    val sb = new java.lang.StringBuilder(15)
    sb.append((v >> 24) & 255).append('.').append((v >> 16) & 255)
      .append('.').append((v >> 8) & 255).append('.').append(v & 255)
    UTF8String.fromString(sb.toString)
  }
}

/** Dotted-quad parse to a UInt32-in-Long; NULL when the string is not
  * exactly four dot-separated digit groups (the composed
  * split/element_at form's documented malformed contract). Groups are
  * combined as `a*2^24 + b*2^16 + c*2^8 + d` without a 0-255 range
  * check, matching the composed arithmetic it replaces. */
case class Ipv4Parse(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "IPv4StringToNum"

  override def nullSafeEval(s: Any): Any =
    Ipv4Parse.parse(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // freshName: a fixed local would collide when the expression
      // appears twice in one whole-stage-codegen function
      val tmp = ctx.freshName("ipv4")
      s"""Long $tmp = graft.functions.Ipv4Parse.parse($s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Ipv4Parse =
    copy(child = c)
}

object Ipv4Parse {
  def parse(s: UTF8String): java.lang.Long = {
    val str = s.toString
    val g = new Array[Long](4)
    var gi = 0
    var group = 0L
    var digits = 0
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        if (digits >= 10) return null
        group = group * 10 + (c - '0')
        digits += 1
      } else if (c == '.') {
        if (digits == 0 || gi >= 3) return null
        g(gi) = group
        gi += 1
        group = 0L
        digits = 0
      } else return null
      i += 1
    }
    if (digits == 0 || gi != 3) return null
    g(3) = group
    java.lang.Long.valueOf(
      (g(0) << 24) + (g(1) << 16) + (g(2) << 8) + g(3))
  }
}

case class Ipv6Format(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "IPv6NumToString"

  override def nullSafeEval(b: Any): Any =
    Ipv6Format.format(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.functions.Ipv6Format.format($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Ipv6Format =
    copy(child = c)
}

object Ipv6Format {

  def format(bytes: Array[Byte]): UTF8String = {
    if (bytes == null || bytes.length != 16) return null
    // IPv4-mapped: 10 zero bytes then 0xffff
    var mapped = bytes(10) == -1 && bytes(11) == -1
    var i = 0
    while (mapped && i < 10) { if (bytes(i) != 0) mapped = false; i += 1 }
    if (mapped) {
      return UTF8String.fromString("::ffff:" +
        (bytes(12) & 0xff) + "." + (bytes(13) & 0xff) + "." +
        (bytes(14) & 0xff) + "." + (bytes(15) & 0xff))
    }
    val g = new Array[Int](8)
    var k = 0
    while (k < 8) {
      g(k) = ((bytes(2 * k) & 0xff) << 8) | (bytes(2 * k + 1) & 0xff)
      k += 1
    }
    // leftmost longest zero run of length ≥ 2
    var bestStart = -1; var bestLen = 0
    var s = 0
    while (s < 8) {
      if (g(s) == 0) {
        var e = s
        while (e < 8 && g(e) == 0) e += 1
        if (e - s > bestLen) { bestStart = s; bestLen = e - s }
        s = e
      } else s += 1
    }
    if (bestLen < 2) { bestStart = -1; bestLen = 0 }
    val sb = new java.lang.StringBuilder(45)
    var idx = 0
    while (idx < 8) {
      if (idx == bestStart) {
        sb.append("::")
        idx += bestLen
      } else {
        if (sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(idx)))
        idx += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Clamp a 16-byte address to the low or high end of its /prefix
    * block (IPv6CIDRToRange's two tuple slots). */
  def cidrBound(bytes: Array[Byte], prefixIn: Int, low: Boolean): Array[Byte] = {
    if (bytes == null || bytes.length != 16) return null
    val prefix = math.max(0, math.min(128, prefixIn))
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val bitsHere = math.max(0, math.min(8, prefix - 8 * i))
      val mask = (0xff << (8 - bitsHere)) & 0xff
      out(i) =
        if (low) (bytes(i) & mask).toByte
        else ((bytes(i) & mask) | (~mask & 0xff)).toByte
      i += 1
    }
    out
  }
}

case class Ipv6CidrBound(addr: Expression, prefix: Expression, low: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = addr
  override def right: Expression = prefix
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (low) "ipv6CidrLow" else "ipv6CidrHigh"

  override def nullSafeEval(a: Any, p: Any): Any =
    Ipv6Format.cidrBound(
      a.asInstanceOf[Array[Byte]], p.asInstanceOf[Int], low)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) =>
      s"""${ev.value} = graft.functions.Ipv6Format.cidrBound($a, $p, $low);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Ipv6CidrBound =
    copy(addr = l, prefix = r)
}

/** isIPAddressInRange(addr, 'cidr') — family-agnostic: IPv4 compares
  * as 32-bit integers, IPv6 as masked 16-byte prefixes; a family
  * mismatch or any parse failure is false (ClickHouse throws on
  * malformed CIDR; a total function composes better in SQL). */
case class IpInRange(addr: Expression, cidr: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = addr
  override def right: Expression = cidr
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "isIPAddressInRange"

  override def nullSafeEval(a: Any, c: Any): Any =
    IpInRange.compute(
      a.asInstanceOf[UTF8String].toString, c.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, c) =>
      s"graft.functions.IpInRange.compute($a.toString(), $c.toString())")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IpInRange =
    copy(addr = l, cidr = r)
}

object IpInRange {

  def compute(addr: String, cidr: String): Boolean = {
    val slash = cidr.lastIndexOf('/')
    if (slash < 1 || slash == cidr.length - 1) return false
    val base = cidr.substring(0, slash)
    var prefix = 0
    var i = slash + 1
    while (i < cidr.length) {
      val ch = cidr.charAt(i)
      if (ch < '0' || ch > '9' || prefix > 128) return false
      prefix = prefix * 10 + (ch - '0')
      i += 1
    }
    val v6 = base.indexOf(':') >= 0
    if (v6) {
      if (prefix > 128) return false
      val b = Ipv6Parse.parse(base)
      val a = Ipv6Parse.parse(addr)
      if (b == null || a == null) return false
      val lo = Ipv6Format.cidrBound(b, prefix, low = true)
      var k = 0
      var eq = true
      while (eq && k < 16) {
        val bitsHere = math.max(0, math.min(8, prefix - 8 * k))
        val mask = (0xff << (8 - bitsHere)) & 0xff
        eq = (a(k) & mask) == (lo(k) & mask)
        k += 1
      }
      eq
    } else {
      if (prefix > 32) return false
      val b = Ipv6Parse.parseV4(base)
      val a = Ipv6Parse.parseV4(addr)
      if (b < 0 || a < 0) return false
      val host = 32 - prefix
      val mask = if (host >= 32) 0L else 0xffffffffL ^ ((1L << host) - 1)
      (a & mask) == (b & mask)
    }
  }
}
