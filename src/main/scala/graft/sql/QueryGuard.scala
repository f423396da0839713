package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** Read-only enforcement for the SQL surface.
  *
  * The reference runs every query under ClickHouse `readonly = 1`
  * (mcp_server.py:424-425, 483-510): reads only, no settings changes.
  * Spark has no session readonly switch, so we enforce it structurally:
  * the statement is parsed with Spark's own SQL parser and the logical
  * plan is rejected if it contains any command node (DDL, SET, CACHE,
  * ...) or an INSERT. No regex "parsing" of SQL text.
  */
final class ReadOnlyViolation(msg: String) extends RuntimeException(msg)

object QueryGuard {

  /** Introspection commands ClickHouse permits under `readonly = 1`
    * (SHOW / DESCRIBE / EXPLAIN families — metadata reads, no writes,
    * no settings changes). */
  private val readOnlyCommands = Set(
    "ShowTables", "ShowTableExtended", "ShowViews", "ShowColumns",
    "ShowNamespaces", "ShowNamespacesCommand", "ShowCreateTable",
    "ShowFunctions", "ShowTableProperties", "ShowCatalogsCommand",
    "DescribeRelation", "DescribeColumn", "DescribeNamespace",
    "DescribeFunction", "DescribeQueryCommand", "ExplainCommand")

  /** Parse `sql` and return its plan iff it is a pure query. */
  def parseReadOnly(spark: SparkSession, sql: String): LogicalPlan = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val offending = plan.collectFirst {
      case c: Command if !readOnlyCommands(c.nodeName) => c.nodeName
      case i: InsertIntoStatement => i.nodeName
    }
    offending.foreach { node =>
      throw new ReadOnlyViolation(
        s"only read-only SELECT statements are allowed (found $node)")
    }
    plan
  }

  def isReadOnly(spark: SparkSession, sql: String): Boolean =
    try { parseReadOnly(spark, sql); true }
    catch { case _: ReadOnlyViolation => false }
}
