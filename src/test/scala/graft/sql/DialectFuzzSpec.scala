package graft.sql

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias

/** Randomized composition of every shim-only construct, pinning the
  * repo's one recurring wrong-answer class: a shim missing a pattern
  * and Spark silently reading `ASOF`/`ANY` as a table ALIAS (a plain
  * row-multiplying join — a wrong answer, not an error).
  *
  * The space is the full cross product of join spelling × select
  * list × nesting × tail clause (> 1000 statements, enumerated
  * deterministically rather than sampled, so a failure names a
  * reproducible case). The property for EVERY statement:
  *
  *   - it plans, and the analyzed plan contains NO SubqueryAlias
  *     literally named `any`/`asof` (the misparse signature); or
  *   - it throws [[ReadOnlyViolation]] (a scoped rejection); or
  *   - it throws a non-parse [[AnalysisException]] (a random combo
  *     can be semantically invalid — ambiguous refs, aggregates
  *     without grouping — which Spark's analyzer rejects loudly).
  *
  * A [[ParseException]] is a FAILURE: it means a shim-only construct
  * leaked through the text pipeline into Spark's parser. */
class DialectFuzzSpec extends graft.SparkSpec {

  private lazy val ready = { TableEnv.register(spark, sf); true }

  private val err =
    "(SELECT * FROM events WHERE event_type = 'error')"
  private val dims =
    "(SELECT user_id AS uid, max(value) AS mv FROM events GROUP BY user_id)"
  private val dims2 =
    "(SELECT user_id, max(value) AS mv FROM events GROUP BY user_id)"

  private val joins = Seq(
    "",
    s"ASOF JOIN $err b ON a.user_id = b.user_id AND a.ts >= b.ts",
    s"ASOF LEFT JOIN $err b ON a.user_id = b.user_id AND a.ts >= b.ts",
    s"ASOF LEFT OUTER JOIN $err b ON a.user_id = b.user_id AND a.ts >= b.ts",
    s"ASOF RIGHT JOIN $err b ON a.user_id = b.user_id AND a.ts >= b.ts",
    s"ASOF JOIN $err b USING (user_id, ts)",
    s"ANY LEFT JOIN $dims d ON a.user_id = d.uid",
    s"LEFT ANY JOIN $dims d ON a.user_id = d.uid",
    s"ANY RIGHT JOIN $dims d ON a.user_id = d.uid",
    s"RIGHT OUTER ANY JOIN $dims d ON a.user_id = d.uid",
    s"FULL ANY JOIN $dims d ON a.user_id = d.uid",
    s"ANY LEFT JOIN $dims2 d USING (user_id)",
    s"ASOF JOIN $err b ON a.user_id = b.user_id AND a.ts >= b.ts " +
      s"ANY LEFT JOIN $dims d ON a.user_id = d.uid")

  private val sels = Seq(
    "*",
    "a.event_id, a.user_id",
    "count(*) AS n",
    "COLUMNS('^(event_id|user_id)$')",
    "a.user_id, COLUMNS('^value$') APPLY(max)",
    "* APPLY(count)")

  private val nests: Seq[String => String] = Seq(
    identity,
    q => s"SELECT count(*) AS outer_n FROM ($q) z",
    q => s"WITH w AS ($q) SELECT count(*) AS outer_n FROM w")

  private val tails = Seq(
    "",
    "ORDER BY 1 LIMIT 5",
    "LIMIT 2 BY event_type",
    "ORDER BY ts WITH FILL",
    "GROUP BY event_type WITH TOTALS",
    "SETTINGS max_threads = 4 FORMAT JSONEachRow")

  private def check(q: String): Option[String] =
    try {
      val df = QueryGuard.plan(spark, q)
      val bad = df.queryExecution.analyzed.collect {
        case s: SubqueryAlias
            if Set("any", "asof")(s.identifier.name.toLowerCase) => s
      }
      if (bad.nonEmpty)
        Some(s"SILENT MISPARSE (ANY/ASOF became a table alias): $q")
      else None
    } catch {
      case _: ReadOnlyViolation => None // scoped rejection
      case _: ParseException =>
        Some(s"PARSER LEAK (shim construct reached Spark's parser): $q")
      case _: AnalysisException => None // loud semantic rejection
    }

  test("every join × select × nesting × tail combination plans or " +
    "rejects — never a silent ANY/ASOF misparse (1404 cases)") {
    assert(ready)
    val failures = for {
      j <- joins
      s <- sels
      n <- nests
      t <- tails
      stmt = n(s"SELECT $s FROM (SELECT * FROM events " +
        s"WHERE event_type = 'click') a $j") +
        (if (t.isEmpty) "" else " " + t)
      f <- check(stmt)
    } yield f
    if (failures.nonEmpty)
      fail(s"${failures.size} failing case(s); first:\n${failures.head}")
  }
}
