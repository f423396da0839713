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

  /** Mount an extra parquet directory as a session-catalog DATABASE,
    * so the guarded SQL path resolves qualified `db.table` names
    * end-to-end (the A1 mount surface; temp views cannot carry a
    * qualifier, so mounts use real external tables — metadata only,
    * no data is copied or written). Idempotent per (session, db). */
  private val mountedDbs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  def registerDatabase(spark: SparkSession, db: String, dir: String): Unit = {
    // remounting the same name onto a DIFFERENT directory must fail
    // loudly — an idempotence check keyed on the name alone would
    // silently keep serving the first directory's data
    val prev = mountedDbs.putIfAbsent((spark, db), dir)
    if (prev != null) {
      require(prev == dir,
        s"database '$db' is already mounted on '$prev'; cannot remount " +
          s"on '$dir' in the same session")
      return
    }
    try {
      require(db.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad database name $db")
      // explicit LOCATION keeps the in-memory catalog from creating a
      // warehouse directory inside the working tree
      val loc = s"${System.getProperty("java.io.tmpdir")}/graft_db_$db"
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$loc'")
      val root = new java.io.File(dir)
      val tables = Option(root.listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet")).sorted
      tables.foreach { t =>
        spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`$t` " +
          s"USING parquet LOCATION '$dir/$t.parquet'")
      }
    } catch {
      // a mid-mount failure must not leave a half-mounted database
      // that can never be repaired in-session
      case e: Throwable => mountedDbs.remove((spark, db)); throw e
    }
  }
}
