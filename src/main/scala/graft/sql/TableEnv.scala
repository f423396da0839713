package graft.sql

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.functions.CHFunctions

/** Registers the data-dir tables as temp views (and the ClickHouse
  * function dialect) so the SQL surface (reference: run_select_query)
  * can resolve them by name. */
object TableEnv {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Idempotent per (session, dir): re-registering would re-open every
    * parquet footer on each query. */
  def register(spark: SparkSession, dir: String): Unit =
    if (registered.add((spark, dir))) {
      CHFunctions.register(spark)
      Tables.all.foreach { n =>
        Tables(spark, dir, n).createOrReplaceTempView(n)
      }
      // the CH system.* surface, queryable through the same SQL path
      // (underscored names: temp views cannot carry a qualifier).
      // Footer-stat metadata only; built once per (session, dir).
      val cat = new graft.catalog.GraftCatalog(spark, dir)
      cat.systemDatabases.createOrReplaceTempView("system_databases")
      cat.systemTables.createOrReplaceTempView("system_tables")
      cat.systemColumns.createOrReplaceTempView("system_columns")
      cat.systemFunctions.createOrReplaceTempView("system_functions")
    }
}
