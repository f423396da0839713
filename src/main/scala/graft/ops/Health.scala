package graft.ops

import org.apache.spark.sql.SparkSession

/** Health probe with the reference's semantics (reference:
  * mcp_clickhouse/mcp_server.py:75-103 `/health`): OK + engine version
  * when the session can run a trivial query, ERROR otherwise. */
object Health {

  final case class Status(ok: Boolean, message: String)

  def check(spark: SparkSession): Status =
    try {
      val n = spark.range(1).count()
      require(n == 1)
      Status(ok = true, s"OK - Connected to Spark ${spark.version}")
    } catch {
      case e: Exception =>
        Status(ok = false, s"ERROR - Cannot run queries: ${e.getMessage}")
    }
}
