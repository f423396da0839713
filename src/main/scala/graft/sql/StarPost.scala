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
  * Scope (documented departures): the modifier chain must be the whole
  * top-level select list (CH also allows COLUMNS among other items and
  * several chains per list); APPLY takes a plain function name (CH
  * also accepts lambdas and parameterized aggregates); Java regex
  * syntax stands in for RE2. A column produced by APPLY over a plain
  * scan is a global aggregate when `f` aggregates, matching CH.
  */
object StarPost {

  final case class StarSpec(regex: Option[String], fn: Option[String])

  private val columnsForm =
    "(?is)^COLUMNS\\s*\\(\\s*'((?:[^']|'')*)'\\s*\\)\\s*(.*)$".r
  private val applyTail =
    "(?is)^APPLY\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$".r
  private val starApplyForm =
    ("(?is)^(\\*|[A-Za-z_][A-Za-z0-9_]*\\.\\*|\\*\\s+EXCEPT\\s*\\([^)]*\\))" +
      "\\s+APPLY\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$").r

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
        df.select(cols.map(c => expr(s"$f(`$c`)").as(s"$f($c)")): _*)
    }
  }
}
