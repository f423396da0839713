package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC passthrough source for bulk analytical reads from a live
  * ClickHouse (or any JDBC) server — the connector role the reference
  * plays against `clickhouse_connect`
  * (reference: mcp_clickhouse/mcp_server.py:461-481).
  *
  * Scale notes: reads are partitioned on a numeric column so 1000
  * executors each open one bounded-range connection; `pushDownPredicate`
  * (Spark default) ships WHERE clauses to the server, and `query` lets
  * the server pre-aggregate before bytes move. No egress exists in this
  * environment, so the option-plumbing is unit-tested and the reader is
  * exercised structurally (a live round-trip needs a server).
  */
object Jdbc {

  final case class Partitioning(
      column: String, lower: Long, upper: Long, numPartitions: Int)

  /** Build the option map — pure, testable without a server. */
  def options(
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      partitioning: Option[Partitioning] = None,
      fetchSize: Int = 100000): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> table,
      "fetchsize" -> fetchSize.toString,
      // ClickHouse's official JDBC driver class; harmless for others
      // when the URL scheme selects a different driver.
      "driver" -> (if (url.startsWith("jdbc:clickhouse"))
        "com.clickhouse.jdbc.ClickHouseDriver" else ""))
      .filter(_._2.nonEmpty)
    val auth = user.map("user" -> _).toMap ++ password.map("password" -> _).toMap
    val parts = partitioning.map { p =>
      Map(
        "partitionColumn" -> p.column,
        "lowerBound" -> p.lower.toString,
        "upperBound" -> p.upper.toString,
        "numPartitions" -> p.numPartitions.toString)
    }.getOrElse(Map.empty)
    base ++ auth ++ parts
  }

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      partitioning: Option[Partitioning] = None): DataFrame =
    spark.read.format("jdbc")
      .options(options(url, table, user, password, partitioning))
      .load()
}
