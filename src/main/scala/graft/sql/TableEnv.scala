package graft.sql

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.functions.CHFunctions

/** Registers the data-dir tables as temp views (and the ClickHouse
  * function dialect) so the SQL surface (reference: run_select_query)
  * can resolve them by name. */
object TableEnv {
  def register(spark: SparkSession, dir: String): Unit = {
    CHFunctions.register(spark)
    Tables.all.foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }
  }
}
