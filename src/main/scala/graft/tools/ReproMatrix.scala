package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sql.{QueryGuard, TableEnv}

/** Dev probe: bisect the q_matrix_interval whole-stage-codegen compile
  * failure ("hashAgg_isNull_NNN is not an rvalue" → interpreted
  * fallback). Runs each candidate snippet and reports whether the
  * CodeGenerator ERROR fires. */
object ReproMatrix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.DEBUG)
    TableEnv.register(spark, sfDir)
    val cases = Seq(
      "corr_only" ->
        "SELECT round(corrMatrix(toFloat64(o_orderkey % 7), toFloat64(o_custkey % 5))[1][2], 6) AS c12 FROM orders"
    )
    cases.foreach { case (name, sql) =>
      System.err.println(s"### BEGIN $name")
      try QueryGuard.plan(spark, sql)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"### $name threw: ${e.getMessage}")
      }
      System.err.println(s"### END $name")
    }
    spark.stop()
  }
}
