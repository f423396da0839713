package graft.sql

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Registers the data-dir tables as temp views so the SQL surface
  * (reference: run_select_query) can resolve them by name. */
object TableEnv {
  def register(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }
}
