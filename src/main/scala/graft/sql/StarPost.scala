package graft.sql

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CH select-list modifiers that need the result SCHEMA — `COLUMNS
  * ('regex')` and the `APPLY(func)` chain (reference accepts any CH
  * SELECT, mcp_server.py:421-459) — handled like [[WithFill]]: a text
  * half cuts the construct down to `*` pre-parse, a plan half expands
  * it against the planned columns.
  *
  *   - `COLUMNS('re')` selects every column whose NAME matches the
  *     regex (partial match, as CH's RE2 find does)
  *   - `... APPLY(f)` maps each selected column through `f`, naming
  *     the result `f(col)` exactly as ClickHouse renders it
  *   - supported chains: `COLUMNS('re')`, `COLUMNS('re') APPLY(f)`,
  *     `* APPLY(f)`, `t.* APPLY(f)`, `* EXCEPT (...) APPLY(f)` (the
  *     EXCEPT stays in the core query — Spark expands it natively)
  *
  * A `COLUMNS('re') [APPLY(f)]` chain may also appear as ONE ITEM of a
  * larger select list (`SELECT id, COLUMNS('^l_') APPLY(sum) ... GROUP
  * BY id` — the form dashboards paste): [[expandItems]] probes the
  * FROM clause's schema with a trailing-clause-free `SELECT *` and
  * expands each chain item textually, so the full statement (GROUP
  * BY, HAVING, ORDER BY included) then plans natively.
  *
  * Scope (documented departures): the bare-star chains (`* APPLY`,
  * `t.* APPLY`, `* EXCEPT ... APPLY`) must still be the whole
  * top-level select list; APPLY takes a plain function name, a
  * parameterized-aggregate head (`APPLY(quantile(0.5))` — expands to
  * CH's `f(params)(col)` call form and flattens through the
  * param-agg shim), or a ONE-parameter lambda (`APPLY(x -> f(x))` —
  * the column substitutes for the parameter; the result is named by
  * the substituted expression text, where CH renders its internal
  * function names — `x -> x + 1` over `n` is `n + 1` here, `plus(n,
  * 1)` there); Java regex syntax stands in for RE2 (a near-superset
  * — backreferences work here that CH would reject; realistic
  * patterns behave identically). A column produced by APPLY over a
  * plain scan is a global aggregate when `f` aggregates, matching
  * CH.
  */
object StarPost {

  final case class StarSpec(regex: Option[String], fn: Option[String])

  // an APPLY payload: a plain function name, a parameterized
  // aggregate head `name(params)` (expands to CH's f(params)(col)
  // call form and flattens through the param-agg shim), or a
  // one-parameter lambda `x -> expr` — the regexes capture the
  // payload broadly and [[applyCall]] validates the form
  private val fnForm = "[A-Za-z_][A-Za-z0-9_]*(?:\\([^()]*\\))?"
  private val columnsForm =
    "(?is)^COLUMNS\\s*\\(\\s*'((?:[^']|'')*)'\\s*\\)\\s*(.*)$".r
  private val applyTail =
    "(?is)^APPLY\\s*\\(\\s*(.+?)\\s*\\)$".r
  private val starApplyForm =
    ("(?is)^(\\*|[A-Za-z_][A-Za-z0-9_]*\\.\\*|\\*\\s+EXCEPT\\s*\\([^)]*\\))" +
      "\\s+APPLY\\s*\\(\\s*(.+?)\\s*\\)$").r
  private val lambdaForm =
    "(?s)^([A-Za-z_][A-Za-z0-9_]*)\\s*->\\s*(.+)$".r

  /** An APPLY payload applied to column `c`: (expression text,
    * result name). Plain names and param-agg heads render CH's
    * `f(col)` / `f(params)(col)` naming; a one-parameter lambda
    * substitutes the column for the parameter and names the result
    * by the substituted text. Anything else is rejected with the
    * supported forms named. */
  private[sql] def applyCall(payload: String, c: String): (String, String) = {
    payload.trim match {
      case lambdaForm(param, body) =>
        (substituteParam(body.trim, param, s"`$c`"),
          substituteParam(body.trim, param, c))
      case p if p.matches(fnForm) =>
        (QueryGuard.rewriteParamAggs(s"$p(`$c`)"), s"$p($c)")
      case p => throw new ReadOnlyViolation(
        s"APPLY payload '$p' is not supported — use a function name, " +
          "a parameterized head f(params), or a one-parameter lambda " +
          "x -> expr")
    }
  }

  /** Token-aware substitution of a lambda parameter: standalone
    * `param` tokens become `repl`; qualified uses (`t.param`) stay. */
  private def substituteParam(body: String, param: String,
      repl: String): String = {
    var out = body
    val ts = QueryGuard.normalizeScan(body)
    ts.reverseIterator.foreach { case (t, _) =>
      if (out.substring(t.start, t.end) == param) {
        val before = out.substring(0, t.start).reverse
          .dropWhile(_.isWhitespace).headOption
        if (!before.contains('.'))
          out = out.substring(0, t.start) + repl + out.substring(t.end)
      }
    }
    out
  }

  /** Cut a top-level COLUMNS/APPLY select list out of `sql`, replacing
    * it with `*` (or the surviving star head) for the core query. */
  def extract(sql: String): (String, Option[StarSpec]) = {
    val ts = QueryGuard.normalizeScan(sql)
    if (ts.isEmpty || ts.head._1.upper != "SELECT" || ts.head._2 != 0)
      return (sql, None)
    val fromAt = ts.find(t => t._2 == 0 && t._1.upper == "FROM")
    val listStart = ts.head._1.end
    val listEnd = fromAt.map(_._1.start).getOrElse(sql.length)
    val list = sql.substring(listStart, listEnd).trim

    def rebuilt(newList: String) =
      sql.substring(0, listStart) + " " + newList + " " +
        sql.substring(listEnd)

    list match {
      case columnsForm(re, rest) =>
        val rex = re.replace("''", "'")
        rest.trim match {
          case "" =>
            (rebuilt("*"), Some(StarSpec(Some(rex), None)))
          case applyTail(f) =>
            (rebuilt("*"), Some(StarSpec(Some(rex), Some(f))))
          case _ => (sql, None) // unsupported chain: let the parser speak
        }
      case starApplyForm(head, f) =>
        (rebuilt(head), Some(StarSpec(None, Some(f))))
      case _ => (sql, None)
    }
  }

  private val columnsItem =
    ("(?is)^COLUMNS\\s*\\(\\s*'((?:[^']|'')*)'\\s*\\)" +
      "(?:\\s+APPLY\\s*\\(\\s*(.+)\\s*\\))?$").r

  /** Expand `COLUMNS('re') [APPLY(f)]` ITEMS inside a larger select
    * list. The matching column set comes from probing the FROM
    * clause's schema (`SELECT *` with every trailing clause cut, so
    * GROUP BY/HAVING don't invalidate the probe); each chain item
    * then becomes plain column references / `f(col)` calls named as
    * CH renders them, and the whole statement plans natively. Returns
    * None when the list has no chain item among others (the
    * whole-list chains stay on the [[extract]] path). */
  def expandItems(sql: String,
      probe: String => DataFrame): Option[String] = {
    val ts = QueryGuard.normalizeScan(sql)
    // the MAIN select: the first depth-0 SELECT token — a leading
    // WITH prefix (CTE items are parenthesized, so their bodies sit
    // at depth > 0) is carried into the probe so FROM can reference
    // the CTEs
    val selAt = ts.find(t => t._2 == 0 && t._1.upper == "SELECT")
      .getOrElse(return None)
    if (ts.head._1.upper != "SELECT" && ts.head._1.upper != "WITH")
      return None
    val prefix = sql.substring(0, selAt._1.start)
    val fromAt = ts.find(t => t._2 == 0 && t._1.upper == "FROM" &&
      t._1.start > selAt._1.start).getOrElse(return None)
    val listStart = selAt._1.end
    val listEnd = fromAt._1.start
    val items = QueryGuard.splitTopLevel(sql.substring(listStart, listEnd))
    // fires on ANY list containing a chain item — including a
    // single-item list, where textual expansion (unlike the post-plan
    // whole-list path) lets the statement's own GROUP BY/HAVING apply
    if (!items.exists(i => columnsItem.findFirstIn(i.trim).isDefined))
      return None
    val stops = Set("GROUP", "HAVING", "ORDER", "LIMIT", "WINDOW",
      "QUALIFY", "UNION", "INTERSECT", "EXCEPT")
    val tailCut = ts.find(t => t._2 == 0 &&
      t._1.start > fromAt._1.start && stops(t._1.upper))
      .map(_._1.start).getOrElse(sql.length)
    // expansion shifts select-list positions, so a bare ordinal
    // ANYWHERE in a GROUP BY/ORDER BY list after a multi-column
    // expansion would silently bind to a different column — reject
    // with guidance instead. Each BY-list runs to the next clause
    // keyword; items are split depth-0 so parenthesized expressions
    // containing digits don't false-positive.
    val tailText = sql.substring(tailCut)
    val hasOrdinal = {
      val byRe = "(?is)\\b(?:GROUP|ORDER)\\s+BY\\b".r
      val endRe = ("(?is)\\b(?:GROUP|ORDER|HAVING|LIMIT|WINDOW|QUALIFY" +
        "|UNION|INTERSECT|EXCEPT|SETTINGS|FORMAT|WITH)\\b").r
      byRe.findAllMatchIn(tailText).exists { mm =>
        val rest = tailText.substring(mm.end)
        val end = endRe.findFirstMatchIn(rest).map(_.start)
          .getOrElse(rest.length)
        QueryGuard.splitTopLevel(rest.substring(0, end)).exists(_.trim
          .matches("(?is)\\d+(\\s+(ASC|DESC))?(\\s+NULLS\\s+(FIRST|LAST))?;?"))
      }
    }
    val schema = probe(prefix + "SELECT * " +
      sql.substring(fromAt._1.start, tailCut).stripSuffix(";")).columns
    val newItems = items.map { it =>
      it.trim match {
        case columnsItem(re, f) =>
          val rex = re.replace("''", "'")
          val p =
            try Pattern.compile(rex)
            catch {
              case e: Exception => throw new ReadOnlyViolation(
                s"COLUMNS regex '$rex' does not compile: ${e.getMessage}")
            }
          val m = schema.filter(c => p.matcher(c).find())
          if (m.isEmpty) throw new ReadOnlyViolation(
            s"COLUMNS('$rex') matched no columns " +
              s"(have: ${schema.mkString(", ")})")
          if (hasOrdinal && m.size != 1) throw new ReadOnlyViolation(
            "COLUMNS expansion changes select-list positions — name " +
              "the GROUP BY/ORDER BY columns instead of using ordinals")
          Option(f) match {
            case None => m.map(c => s"`$c`").mkString(", ")
            case Some(fn) =>
              // name/param-head/lambda payloads expand per column
              // through [[applyCall]]
              m.map { c =>
                val (call, name) = applyCall(fn, c)
                s"$call AS `$name`"
              }.mkString(", ")
          }
        case other => other
      }
    }
    Some(sql.substring(0, listStart) + " " + newItems.mkString(", ") +
      " " + sql.substring(listEnd))
  }

  /** Expand the recorded modifier chain against the planned columns. */
  def apply(df: DataFrame, spec: StarSpec): DataFrame = {
    val cols = spec.regex match {
      case Some(re) =>
        val p =
          try Pattern.compile(re)
          catch {
            case e: Exception => throw new ReadOnlyViolation(
              s"COLUMNS regex '$re' does not compile: ${e.getMessage}")
          }
        val m = df.columns.filter(c => p.matcher(c).find())
        if (m.isEmpty) throw new ReadOnlyViolation(
          s"COLUMNS('$re') matched no columns " +
            s"(have: ${df.columns.mkString(", ")})")
        m.toSeq
      case None => df.columns.toSeq
    }
    spec.fn match {
      case None => df.select(cols.map(col): _*)
      case Some(f) =>
        // name/param-head/lambda payloads expand per column through
        // [[applyCall]]
        df.select(cols.map { c =>
          val (call, name) = applyCall(f, c)
          expr(call).as(name)
        }: _*)
    }
  }
}
