package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All ClickHouse URL parts in ONE native scan:
  * `struct(protocol, host, host_nw, tld, path, query)`.
  *
  * The regexp_extract formulation runs 5+ separate Java regex engines
  * per row (measured ~13us/row across the projection); parse_url is
  * worse still (a java.net.URI allocation per field, ~60us/row). This
  * is a single index-scanning pass, participates in whole-stage
  * codegen, and subexpression elimination evaluates it once per row no
  * matter how many part accessors the query uses.
  *
  * Semantics match ClickHouse: a non-URL input yields '' (never null);
  * `host` excludes userinfo and port; `host_nw` drops one leading
  * "www."; `tld` is the last dot-separated host label; `path` is the
  * fragmentless, queryless path; `query` is everything between '?' and
  * '#' (scheme not required, as in the regex `\?([^#]*)`).
  */
case class UrlParse(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(
    Seq("protocol", "host", "host_nw", "tld", "path", "query")
      .map(StructField(_, StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    UrlParse.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlParse.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlParse =
    copy(child = newChild)
}

object UrlParse {

  private val EMPTY = UTF8String.EMPTY_UTF8

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length

    var protocol = ""; var host = ""; var path = ""
    val sep = s.indexOf("://")
    val schemeOk = sep > 0 && isAlpha(s.charAt(0)) && {
      var i = 1; var ok = true
      while (ok && i < sep) { ok = isSchemeChar(s.charAt(i)); i += 1 }
      ok
    }
    if (schemeOk) {
      protocol = s.substring(0, sep)
      val a = sep + 3
      // authority = chars up to the first '/', '?' or '#'
      var end = a
      while (end < len && { val c = s.charAt(end)
        c != '/' && c != '?' && c != '#' }) end += 1
      val authority = s.substring(a, end)
      // strip userinfo (greedy: last '@', as in the regex form) + port
      val hostPart = authority.substring(authority.lastIndexOf('@') + 1)
      val colon = hostPart.indexOf(':')
      host = if (colon >= 0) hostPart.substring(0, colon) else hostPart
      // path = from authority end up to '?' or '#'
      var pend = end
      while (pend < len && { val c = s.charAt(pend)
        c != '?' && c != '#' }) pend += 1
      path = s.substring(end, pend)
    }

    var query = ""
    val q = s.indexOf('?')
    if (q >= 0) {
      val qend = s.indexOf('#', q + 1)
      query = s.substring(q + 1, if (qend >= 0) qend else len)
    }

    val hostNw = if (host.startsWith("www.")) host.substring(4) else host
    val tld = host.substring(host.lastIndexOf('.') + 1)

    new GenericInternalRow(Array[Any](
      if (protocol.isEmpty) EMPTY else UTF8String.fromString(protocol),
      if (host.isEmpty) EMPTY else UTF8String.fromString(host),
      if (hostNw.isEmpty) EMPTY else UTF8String.fromString(hostNw),
      if (tld.isEmpty) EMPTY else UTF8String.fromString(tld),
      if (path.isEmpty) EMPTY else UTF8String.fromString(path),
      if (query.isEmpty) EMPTY else UTF8String.fromString(query)))
  }
}
