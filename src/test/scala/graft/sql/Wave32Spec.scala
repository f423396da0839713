package graft.sql

import graft.SparkSpec
import graft.functions.CHFunctions

/** Wave-32 value pins: CH meta statements over temp-view mounts,
  * the generator/merge table functions, and the query-parameter
  * guidance reject. */
class Wave32Spec extends SparkSpec {

  private def rows(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect()
  }

  test("SHOW CREATE TABLE serves the mounted schema as DDL") {
    val r = rows("SHOW CREATE TABLE orders")
    assert(r.length == 1)
    val ddl = r.head.getString(0)
    assert(ddl.startsWith("CREATE TABLE default.orders (") &&
      ddl.contains("o_orderkey") && ddl.contains("USING parquet"))
    assert(rows("SHOW CREATE TABLE orders").head.schema.fieldNames
      .toSeq == Seq("statement"))
    val e = intercept[Exception](rows("SHOW CREATE TABLE nosuch"))
    assert(e.getMessage.contains("unknown table"))
  }

  test("EXISTS answers UInt8 result, statement-initial only") {
    assert(rows("EXISTS TABLE orders").head.getByte(0) == 1)
    assert(rows("EXISTS nosuch").head.getByte(0) == 0)
    // EXISTS inside a SELECT is the ordinary subquery operator
    val sub = rows(
      "SELECT count() AS n FROM nation WHERE EXISTS " +
        "(SELECT 1 FROM region WHERE r_regionkey = n_regionkey)")
    assert(sub.head.getLong(0) == 25L)
  }

  test("SHOW TABLES / SHOW DATABASES serve CH's one-column `name` shape") {
    val t = rows("SHOW TABLES")
    assert(t.head.schema.fieldNames.toSeq == Seq("name"))
    val names = t.map(_.getString(0)).toSeq
    assert(names.contains("orders") && names.contains("lineitem"))
    assert(names == names.sorted)
    // LIKE / NOT LIKE / ILIKE tails, and LIMIT
    assert(rows("SHOW TABLES LIKE 'order%'").map(_.getString(0)).toSeq
      == Seq("orders"))
    assert(rows("SHOW TABLES ILIKE 'ORDER%'").map(_.getString(0)).toSeq
      == Seq("orders"))
    assert(!rows("SHOW TABLES NOT LIKE 'order%'")
      .exists(_.getString(0) == "orders"))
    assert(rows("SHOW TABLES LIMIT 2").length == 2)
    val d = rows("SHOW DATABASES")
    assert(d.head.schema.fieldNames.toSeq == Seq("name"))
    assert(d.exists(_.getString(0) == "default"))
  }

  test("SHOW FUNCTIONS / SETTINGS / PROCESSLIST serve CH shapes") {
    val f = rows("SHOW FUNCTIONS LIKE 'toStartOf%'")
    assert(f.head.schema.fieldNames.toSeq == Seq("name"))
    assert(f.map(_.getString(0)).contains("toStartOfDay"))
    val st = rows("SHOW SETTINGS LIKE '%timezone%'")
    assert(st.head.schema.fieldNames.toSeq == Seq("name", "value"))
    assert(st.exists(_.getString(0) == "session_timezone"))
    val p = rows("SHOW PROCESSLIST")
    assert(p.isEmpty ||
      p.head.schema.fieldNames.contains("query"))
  }

  test("OFFSET ... FETCH rewrites onto the LIMIT forms") {
    val r = rows(
      """SELECT o_orderkey FROM orders ORDER BY o_orderkey
        |OFFSET 3 ROWS FETCH FIRST 2 ROWS ONLY""".stripMargin)
    assert(r.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    val bare = rows(
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey " +
        "FETCH NEXT 2 ROWS ONLY")
    assert(bare.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // WITH TIES rides the existing LIMIT ... WITH TIES shim
    val ties = rows(
      "SELECT o_orderkey % 3 AS g FROM orders ORDER BY g " +
        "FETCH FIRST 1 ROWS WITH TIES")
    assert(ties.nonEmpty && ties.forall(_.getLong(0) == 0L))
    assert(ties.length > 1)
    val e = intercept[Exception](rows(
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey " +
        "OFFSET 2 ROWS FETCH FIRST 2 ROWS WITH TIES"))
    assert(e.getMessage.contains("WITH TIES"), e.getMessage)
  }

  test("generateSeries is inclusive-stop in both directions; zeros counts") {
    assert(rows("SELECT * FROM generateSeries(2, 10, 3)")
      .map(_.getLong(0)).toSeq == Seq(2L, 5L, 8L))
    assert(rows("SELECT * FROM generate_series(5, 1, -2)")
      .map(_.getLong(0)).toSeq == Seq(5L, 3L, 1L))
    assert(rows("SELECT * FROM generateSeries(1, 5)")
      .map(_.getLong(0)).toSeq == (1L to 5L))
    assert(rows("SELECT * FROM generateSeries(5, 1)").isEmpty)
    val z = rows("SELECT count(*) AS n, max(zero) AS mz FROM zeros(7)")
    assert(z.head.getLong(0) == 7L && z.head.getShort(1) == 0)
  }

  test("merge() unions mounted tables matching the pattern") {
    val direct = rows("SELECT count() AS n FROM orders").head.getLong(0)
    assert(rows("SELECT count() AS n FROM merge('default', '^orders$')")
      .head.getLong(0) == direct)
    // system db targets the system_* views, prefix stripped
    assert(rows("SELECT count() AS n FROM merge('system', '^one$')")
      .head.getLong(0) == 1L)
    val e = intercept[Exception](
      rows("SELECT 1 FROM merge('default', '^nosuchtable$')"))
    assert(e.getMessage.contains("no mounted table"))
  }

  test("query parameters reject with binding guidance; string braces are data") {
    val e = intercept[Exception](rows("SELECT {n:UInt8} AS p"))
    assert(e.getMessage.contains("query parameter") &&
      e.getMessage.contains("inline"))
    assert(rows("SELECT '{a:1}' AS s").head.getString(0) == "{a:1}")
  }
}
