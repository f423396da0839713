package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix resolution for the URL dialect functions
  * (reference: ClickHouse embeds the full publicsuffix.org database
  * behind firstSignificantSubdomain — FirstSignificantSubdomain.h).
  *
  * Rules load once per JVM from `graft/public_suffix_list.dat`, a
  * resource in the upstream publicsuffix.org file format (`*.`
  * wildcards, `!` exceptions, `//` comments), so the shipped
  * ICANN-section snapshot can be replaced wholesale by the full
  * public dataset without code changes. Matching is the standard
  * PSL algorithm: the longest matching rule wins, a wildcard matches
  * exactly one extra label, an exception truncates its own leftmost
  * label, and the implicit `*` default makes the bare TLD the suffix
  * for unlisted domains.
  *
  * The registrable domain is the public suffix plus one label; the
  * "first significant subdomain" is that label:
  * `news.yandex.com.tr` → `yandex` (com.tr is a suffix),
  * `a.gov.uk` → `a`, `www.example.org` → `example`. A host that IS
  * a public suffix (or empty) yields `''`, like the reference.
  */
object PublicSuffix {

  private val EMPTY = UTF8String.EMPTY_UTF8

  /** (exact rules, wildcard parents, exception rules), each a set of
    * dot-joined label suffixes, lowercase. */
  private lazy val (rules, wildcards, exceptions):
      (Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "missing resource graft/public_suffix_list.dat")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val r = Set.newBuilder[String]
    val w = Set.newBuilder[String]
    val x = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim.toLowerCase
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) x += line.substring(1)
        else if (line.startsWith("*.")) w += line.substring(2)
        else r += line
      }
    }
    (r.result(), w.result(), x.result())
  }

  /** Number of labels in `host`'s public suffix (PSL algorithm with
    * the implicit `*` default), given the host's labels. */
  private def suffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    // dot-joined suffix of the last k labels, built right-to-left
    var suffix = ""
    var best = 1 // the implicit * rule
    var k = 1
    while (k <= n) {
      suffix =
        if (k == 1) labels(n - 1) else labels(n - k) + "." + suffix
      if (exceptions.contains(suffix)) return k - 1
      if (rules.contains(suffix) && k > best) best = k
      // a wildcard parent of length k makes a k+1-label suffix
      if (k < n && wildcards.contains(suffix) && k + 1 > best) best = k + 1
      k += 1
    }
    best
  }

  /** The label left of the public suffix, `''` when the host has no
    * registrable domain. Static + UTF8String-typed for codegen. */
  def firstSignificant(host: UTF8String): UTF8String = {
    val h = host.toString.toLowerCase
    if (h.isEmpty) return EMPTY
    val labels = h.split('.')
    val k = suffixLabels(labels)
    if (labels.length <= k) EMPTY
    else UTF8String.fromString(labels(labels.length - k - 1))
  }

  /** The registrable domain (public suffix + one label), `''` when
    * the host is itself a suffix. */
  def cutToFirstSignificant(host: UTF8String): UTF8String = {
    val h = host.toString.toLowerCase
    if (h.isEmpty) return EMPTY
    val labels = h.split('.')
    val k = suffixLabels(labels)
    if (labels.length <= k) EMPTY
    else UTF8String.fromString(
      labels.slice(labels.length - k - 1, labels.length).mkString("."))
  }
}

/** `firstSignificantSubdomain(host)` over an already-extracted host
  * string (the dialect builder feeds it [[UrlParse]]'s host field). */
case class FirstSignificantSubdomain(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    PublicSuffix.firstSignificant(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PublicSuffix.firstSignificant($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FirstSignificantSubdomain = copy(child = newChild)
}

/** `cutToFirstSignificantSubdomain(host)`: host from the first
  * significant subdomain on. */
case class CutToFirstSignificantSubdomain(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    PublicSuffix.cutToFirstSignificant(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PublicSuffix.cutToFirstSignificant($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CutToFirstSignificantSubdomain =
    copy(child = newChild)
}
