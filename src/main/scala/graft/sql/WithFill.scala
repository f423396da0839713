package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ORDER BY ... WITH FILL [FROM f] [TO t] [STEP s]` for pasted
  * ClickHouse queries (reference accepts any CH SELECT,
  * mcp_server.py:421-459).
  *
  * The clause needs the result SCHEMA (filler rows carry each
  * column's type default, as in ClickHouse), so unlike the pure-text
  * shims in [[QueryGuard.normalizeDialect]] it splits into a text
  * half — [[extract]] cuts the clause and returns a [[FillSpec]] —
  * and a plan half — [[apply]] rebuilds the dense axis around the
  * planned core query with the bounds-broadcast + `sequence`/explode
  * shape proven by `q_with_fill` (operators/Relational.scala): one
  * row of min/max bounds explodes into the axis, grid points absent
  * from the result join anti against it (broadcast — the axis is
  * tiny), and the union re-sorts by the query's ORDER BY. No
  * collect, no per-row driver work: scale-safe at any axis length
  * that fits a result set.
  *
  * `INTERPOLATE [(cols)]` carries columns forward across filler rows
  * (bare INTERPOLATE carries every non-axis column, as in CH): filler
  * rows take the nearest preceding REAL row's value — for the plain
  * column form this equals CH's previous-output-row rule across any
  * run of fillers. The `col AS expr` cascade form re-evaluates expr
  * per filler row against the previous output row; it is inherently
  * sequential WITHIN a filler run, so the k-th filler after a real
  * row computes the k-fold self-application `expr^k(last_real)` via
  * Spark's `aggregate(sequence(1, k), init, acc -> expr)` HOF —
  * codegen'd, per-row bounded by the run length, no driver loop.
  * Scope: self-references of the interpolated column cascade exactly
  * as in CH; references to OTHER columns inside expr resolve against
  * the filler row itself (the fill axis carries its real grid value
  * there, other columns their type defaults), where CH would read
  * the previous output row.
  *
  * Scope (documented departures): the fill column must be a named
  * output column (CH also fills computed sort expressions); one
  * WITH FILL per statement (CH allows one per sort column).
  * `TO` is exclusive, as in CH.
  */
object WithFill {

  /** `interpolate`: None = no clause; Some(Nil) = bare INTERPOLATE
    * (carry every non-ORDER-BY column); Some(items) = the listed
    * columns, each with an optional cascade expression (`col AS
    * expr`). */
  final case class FillSpec(
      column: String,
      from: Option[String],
      to: Option[String],
      step: Option[String],
      orderText: String,
      interpolate: Option[Seq[(String, Option[String])]] = None)

  /** Cut a top-level `WITH FILL [FROM ..] [TO ..] [STEP ..]` out of
    * `sql`; the returned core keeps its ORDER BY. */
  def extract(sql: String): (String, Option[FillSpec]) = {
    val ts = QueryGuard.normalizeScan(sql)
    val fillAt = ts.indices.find { i =>
      i + 1 < ts.size && ts(i)._2 == 0 && ts(i)._1.upper == "WITH" &&
        ts(i + 1)._1.upper == "FILL" &&
        // a CTE merely NAMED fill (`WITH fill AS (...)`) is not the
        // clause
        !(i + 2 < ts.size && ts(i + 2)._1.upper == "AS")
    }
    fillAt match {
      case None => (sql, None)
      case Some(i) =>
        val orderAt = (0 until i).reverse.find { j =>
          j + 1 < ts.size && ts(j)._2 == 0 && ts(j)._1.upper == "ORDER" &&
            ts(j + 1)._1.upper == "BY"
        }.getOrElse(throw new ReadOnlyViolation(
          "WITH FILL is only valid inside a top-level ORDER BY"))
        val orderText = sql.substring(ts(orderAt + 1)._1.end, ts(i)._1.start)
          .trim
        // the fill column is the last sort item, direction dropped
        var colText = orderText.split(",").last.trim
        val up = colText.toUpperCase
        if (up.endsWith(" DESC")) colText = colText.dropRight(5).trim
        else if (up.endsWith(" ASC")) colText = colText.dropRight(4).trim
        colText = colText.stripPrefix("`").stripSuffix("`")

        // FROM/TO/STEP sub-clauses: each value runs to the next
        // depth-0 clause keyword or end of statement
        val stop = Set("FROM", "TO", "STEP", "INTERPOLATE", "LIMIT",
          "SETTINGS", "FORMAT")
        var from: Option[String] = None
        var to: Option[String] = None
        var step: Option[String] = None
        var endOfFill = ts(i + 1)._1.end
        var j = i + 2
        var done = false
        while (!done && j < ts.size && ts(j)._2 == 0 &&
          Set("FROM", "TO", "STEP")(ts(j)._1.upper)) {
          val next = ((j + 1) until ts.size).find(x =>
            ts(x)._2 == 0 && stop(ts(x)._1.upper))
          val vEnd = next.map(x => ts(x)._1.start).getOrElse(sql.length)
          val v = sql.substring(ts(j)._1.end, vEnd).trim
            .stripSuffix(";").trim
          ts(j)._1.upper match {
            case "FROM" => from = Some(v)
            case "TO" => to = Some(v)
            case "STEP" => step = Some(v)
          }
          endOfFill = vEnd
          next match {
            case Some(x) => j = x
            case None => done = true
          }
        }
        if (step.exists(_.isEmpty) || from.exists(_.isEmpty) ||
          to.exists(_.isEmpty))
          throw new ReadOnlyViolation("empty WITH FILL FROM/TO/STEP value")
        // optional trailing INTERPOLATE [(col [AS expr], ...)]
        var interpolate: Option[Seq[(String, Option[String])]] = None
        val interpAt = (0 until ts.size).find(x =>
          ts(x)._1.start >= endOfFill && ts(x)._2 == 0 &&
            ts(x)._1.upper == "INTERPOLATE" &&
            sql.substring(endOfFill, ts(x)._1.start).trim.isEmpty)
        interpAt.foreach { x =>
          val afterTok = sql.substring(ts(x)._1.end)
          val trimmed = afterTok.dropWhile(_.isWhitespace)
          if (trimmed.headOption.contains('(')) {
            val open = ts(x)._1.end + (afterTok.length - trimmed.length)
            var depth2 = 0
            var k = open
            var close = -1
            while (k < sql.length && close < 0) {
              sql.charAt(k) match {
                case '(' => depth2 += 1
                case ')' => depth2 -= 1; if (depth2 == 0) close = k
                case _ =>
              }
              k += 1
            }
            if (close < 0) throw new ReadOnlyViolation(
              "unbalanced INTERPOLATE parens")
            val items = splitTopLevel(sql.substring(open + 1, close))
              .map(_.trim).filter(_.nonEmpty)
            // `col` carries forward; `col AS expr` cascades expr per
            // filler row (the first depth-0 AS splits the item)
            interpolate = Some(items.map { it =>
              QueryGuard.normalizeScan(it).find(t =>
                t._2 == 0 && t._1.upper == "AS") match {
                case Some((t, _)) =>
                  (it.substring(0, t.start).trim
                    .stripPrefix("`").stripSuffix("`"),
                    Some(it.substring(t.end).trim))
                case None =>
                  (it.stripPrefix("`").stripSuffix("`"), None)
              }
            })
            endOfFill = close + 1
          } else {
            interpolate = Some(Nil) // bare: all non-axis columns
            endOfFill = ts(x)._1.end
          }
        }
        val core = (sql.substring(0, ts(i)._1.start).stripTrailing +
          " " + sql.substring(endOfFill).stripLeading).stripTrailing
        (core, Some(FillSpec(colText, from, to, step, orderText, interpolate)))
    }
  }

  /** Densify `df` along `spec.column`: grid points missing from the
    * result are appended as filler rows carrying type defaults, then
    * the whole union re-sorts by the query's ORDER BY. Off-grid rows
    * already in the result are kept, as in CH. */
  def apply(df: DataFrame, spec: FillSpec): DataFrame = {
    val cn = df.columns.find(_.equalsIgnoreCase(spec.column))
      .getOrElse(throw new ReadOnlyViolation(
        s"WITH FILL column '${spec.column}' must be an output column " +
          s"of the query (have: ${df.columns.mkString(", ")})"))
    val dt = df.schema(cn).dataType
    val defaultStep: Column = dt match {
      case DateType | TimestampType => expr("interval 1 day")
      case _ => lit(1)
    }
    // sequence() wants the step's integral width to match the axis
    val stepCol = spec.step.map(expr).getOrElse(defaultStep) match {
      case s if dt.isInstanceOf[NumericType] => s.cast(dt)
      case s => s
    }
    val bounds = df.agg(min(col(cn)).as("__graft_lo"),
      max(col(cn)).as("__graft_hi"))
    val loCol = spec.from.map(expr).getOrElse(col("__graft_lo")).cast(dt)
    val hiCol = spec.to.map(expr).getOrElse(col("__graft_hi")).cast(dt)
    var axis = bounds
      .select(explode(sequence(loCol, hiCol, stepCol)).as(cn))
    // CH's TO bound is exclusive
    spec.to.foreach(t => axis = axis.filter(col(cn) < expr(t).cast(dt)))
    val missing = broadcast(axis).join(df, Seq(cn), "left_anti")
    val interp: Seq[(String, Option[String])] = spec.interpolate match {
      case None => Nil
      case Some(Nil) =>
        // bare form: CH carries forward every column EXCEPT all ORDER
        // BY columns (not only the fill axis) — a secondary sort key
        // takes its type default on filler rows
        val orderCols = orderColNames(spec.orderText)
        df.columns.filterNot(c =>
          orderCols.exists(_.equalsIgnoreCase(c))).toSeq.map((_, None))
      case Some(cs) => cs.map { case (c, e) =>
        (df.columns.find(_.equalsIgnoreCase(c))
          .getOrElse(throw new ReadOnlyViolation(
            s"INTERPOLATE column '$c' must be an output column")), e)
      }
    }
    val interpNames = interp.map(_._1)
    val filler = missing.select(df.columns.map { c2 =>
      if (c2 == cn) col(cn)
      else if (interpNames.contains(c2)) // filled below, from real rows
        lit(null).cast(df.schema(c2).dataType).as(c2)
      else typeDefault(df.schema(c2).dataType).as(c2)
    }.toIndexedSeq: _*)
    if (interp.isEmpty)
      df.unionByName(filler).sort(sortItems(spec.orderText): _*)
    else {
      // Carry each interpolated column forward from the nearest
      // preceding REAL row (struct-wrapped so a legitimate NULL in a
      // real row still propagates, as CH's previous-row rule does).
      // The single global window matches the operation's shape: a
      // WITH FILL result is already a globally sorted axis.
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(sortItems(spec.orderText): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      var out = df.withColumn("__graft_fill", lit(0))
        .unionByName(filler.withColumn("__graft_fill", lit(1)))
      val helperCols = scala.collection.mutable.ArrayBuffer(
        "__graft_fill")
      if (interp.exists(_._2.isDefined)) {
        // the cascade form needs k = the filler's position within its
        // run: group rows by the count of real rows at-or-before them,
        // then number within the group (the real row is row 0)
        out = out.withColumn("__graft_grp",
          sum(when(col("__graft_fill") === 0, 1).otherwise(0)).over(w))
        val wg = Window.partitionBy(col("__graft_grp"))
          .orderBy(sortItems(spec.orderText): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn("__graft_k",
          (count(lit(1)).over(wg) - 1).cast("int"))
        helperCols += "__graft_grp"
        helperCols += "__graft_k"
      }
      interp.zipWithIndex.foreach { case ((c, exprOpt), idx) =>
        val dt = df.schema(c).dataType
        val lastReal = last(
          when(col("__graft_fill") === 0, struct(col(c))), ignoreNulls = true)
          .over(w)
        exprOpt match {
          case None =>
            out = out.withColumn(c,
              when(col("__graft_fill") === 1,
                coalesce(lastReal.getField(c), typeDefault(dt)))
                .otherwise(col(c)))
          case Some(e) =>
            // expr^k(last_real): iterate the self-substituted
            // expression k times with aggregate() — one codegen'd
            // pass, cost bounded by the filler run length. The
            // lambda's accumulator stands in for the column; other
            // names in `e` resolve against the filler row.
            val accVar = "__graft_acc"
            val eSub = substituteName(e, c, accVar)
            val initCol = s"__graft_init_$idx"
            out = out.withColumn(initCol, lastReal.getField(c))
            helperCols += initCol
            val cascade = expr(
              s"aggregate(sequence(1, greatest(__graft_k, 1)), " +
                s"CAST($initCol AS ${dt.sql}), " +
                s"($accVar, __graft_i) -> CAST(($eSub) AS ${dt.sql}))")
            out = out.withColumn(c,
              when(col("__graft_fill") === 1,
                coalesce(cascade, typeDefault(dt)))
                .otherwise(col(c)))
        }
      }
      out.drop(helperCols.toSeq: _*).sort(sortItems(spec.orderText): _*)
    }
  }

  /** Token-aware substitution: standalone `name` tokens in `e` become
    * `repl`; qualified uses (`t.name`) stay. */
  private def substituteName(e: String, name: String,
      repl: String): String = {
    var out = e
    val ts = QueryGuard.normalizeScan(e)
    ts.reverseIterator.foreach { case (t, _) =>
      if (out.substring(t.start, t.end).equalsIgnoreCase(name)) {
        val before = out.substring(0, t.start).reverse
          .dropWhile(_.isWhitespace).headOption
        if (!before.contains('.'))
          out = out.substring(0, t.start) + repl + out.substring(t.end)
      }
    }
    out
  }

  /** ClickHouse fills non-axis columns with the column type's default
    * value, not NULL. */
  private def typeDefault(dt: DataType): Column = dt match {
    case _: NumericType => lit(0).cast(dt)
    case StringType => lit("")
    case BooleanType => lit(false)
    case DateType => lit("1970-01-01").cast(DateType)
    case TimestampType => lit("1970-01-01 00:00:00").cast(TimestampType)
    case other => lit(null).cast(other)
  }

  /** Strip a sort item's trailing NULLS FIRST/LAST and ASC/DESC:
    * (bare expression text, desc?, nullsFirst?). */
  private def stripSortSuffixes(item0: String)
      : (String, Boolean, Option[Boolean]) = {
    var item = item0.trim
    var up = item.toUpperCase
    var nullsFirst: Option[Boolean] = None
    if (up.endsWith(" NULLS FIRST")) {
      nullsFirst = Some(true); item = item.dropRight(12).trim
    } else if (up.endsWith(" NULLS LAST")) {
      nullsFirst = Some(false); item = item.dropRight(11).trim
    }
    up = item.toUpperCase
    var desc = false
    if (up.endsWith(" DESC")) { desc = true; item = item.dropRight(5).trim }
    else if (up.endsWith(" ASC")) item = item.dropRight(4).trim
    (item, desc, nullsFirst)
  }

  /** Parse an ORDER BY item list back into sort columns (aliases
    * resolve against the unioned result). */
  private def sortItems(orderText: String): Seq[Column] =
    splitTopLevel(orderText).map { item0 =>
      val (item, desc, nullsFirst) = stripSortSuffixes(item0)
      val base = expr(item)
      (desc, nullsFirst) match {
        case (false, None) => base.asc
        case (false, Some(true)) => base.asc_nulls_first
        case (false, Some(false)) => base.asc_nulls_last
        case (true, None) => base.desc
        case (true, Some(true)) => base.desc_nulls_first
        case (true, Some(false)) => base.desc_nulls_last
      }
    }

  /** Bare column names of the ORDER BY items (direction and NULLS
    * ordering stripped), for the bare-INTERPOLATE exclusion set. */
  private def orderColNames(orderText: String): Seq[String] =
    splitTopLevel(orderText).map(item0 =>
      stripSortSuffixes(item0)._1.stripPrefix("`").stripSuffix("`"))

  /** Comma split that respects parens and quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < s.length && s.charAt(i) != q) {
            if (s.charAt(i) == '\\' && q != '`') i += 1
            i += 1
          }
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }
}
