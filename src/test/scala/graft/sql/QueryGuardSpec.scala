package graft.sql

import graft.SparkSpec

class QueryGuardSpec extends SparkSpec {

  test("plain SELECT passes") {
    assert(QueryGuard.isReadOnly(spark, "SELECT 1"))
    assert(QueryGuard.isReadOnly(spark,
      "WITH t AS (SELECT 1 AS x) SELECT x FROM t ORDER BY x"))
  }

  test("DDL / DML / settings are rejected") {
    val bad = Seq(
      "CREATE TABLE t (x INT)",
      "DROP TABLE t",
      "INSERT INTO t VALUES (1)",
      "SET spark.sql.shuffle.partitions=1",
      "CACHE TABLE t",
      "ALTER TABLE t ADD COLUMNS (y INT)",
      "TRUNCATE TABLE t",
      "CREATE VIEW v AS SELECT 1")
    bad.foreach { sql =>
      assert(!QueryGuard.isReadOnly(spark, sql), sql)
    }
  }

  test("introspection commands pass, like ClickHouse readonly=1") {
    val ok = Seq(
      "SHOW TABLES", "SHOW DATABASES", "SHOW COLUMNS IN t",
      "DESCRIBE TABLE t", "EXPLAIN SELECT 1", "SHOW FUNCTIONS")
    ok.foreach { sql =>
      assert(QueryGuard.isReadOnly(spark, sql), sql)
    }
  }

  test("rejection names the offending node") {
    val e = intercept[ReadOnlyViolation] {
      QueryGuard.parseReadOnly(spark, "DROP TABLE t")
    }
    assert(e.getMessage.contains("read-only"))
  }
}
