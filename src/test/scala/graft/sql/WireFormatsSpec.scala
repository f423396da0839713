package graft.sql

import graft.SparkSpec
import graft.functions.CHFunctions
import graft.ops.{GraftConfig, HealthServer}

/** Wave-35 wire formats: TabSeparated[WithNames], PrettyCompact,
  * Vertical and Values — value-level pins on the renderers AND
  * endpoint-level pins through /query?format=... (the r13/r14 lesson:
  * the oracle never sees wire cells, so these specs ARE the proof). */
class WireFormatsSpec extends SparkSpec {

  private def result(sql: String): QueryResult = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    new QueryExecutor(spark, timeoutSec = 60).run(sql)
  }

  test("TSV: tab cells, \\N nulls, CH in-cell escapes, composite literals") {
    val r = result(
      "SELECT 'a\tb' AS t, NULL AS n, [1, 2] AS arr, 'x' AS s")
    assert(r.toTsv(withNames = false) == "a\\tb\t\\N\t[1,2]\tx")
    val named = r.toTsv(withNames = true).split("\n")
    assert(named(0) == "t\tn\tarr\ts")
    assert(named(1) == "a\\tb\t\\N\t[1,2]\tx")
  }

  test("IEEE specials render as CH's inf/-inf/nan in text, null in JSON") {
    val r = result("SELECT 1/0 AS a, -1/0 AS b, 0/0 AS c")
    assert(r.toTsv(withNames = false) == "inf\t-inf\tnan")
    assert(r.toCsv.split("\n")(1) == "inf,-inf,nan")
    // JSON keeps CH's output_format_json_quote_denormals = 0 default
    assert(r.toJsonEachRow == """{"a": null, "b": null, "c": null}""")
  }

  test("Pretty: header in the top border, numerics right-aligned") {
    val r = result(
      "SELECT 'ab' AS s, 7 AS n UNION ALL SELECT 'longer', 12345")
    val lines = r.toPretty.split("\n")
    assert(lines.head.startsWith("┌─s─") &&
      lines.head.contains("┬─n─"))
    assert(lines.last.startsWith("└"))
    val dataLines = lines.filter(_.startsWith("│"))
    assert(dataLines.exists(_.contains("│ ab     │")))
    assert(dataLines.exists(l => l.contains("    7 │"))) // right-aligned
    assert(dataLines.exists(_.contains(" 12345 │")))
  }

  test("Vertical: Row banners and aligned column names") {
    val r = result("SELECT 'x' AS name, 42 AS v UNION ALL SELECT 'y', 7")
    val v = r.toVertical
    assert(v.contains("Row 1:") && v.contains("Row 2:"))
    assert(v.contains("name: x") && v.contains("v:    42"))
  }

  test("Values: nested CH literals, rows comma-joined") {
    val r = result("SELECT 1 AS a, 'x,y' AS b UNION ALL SELECT 2, 'z'")
    assert(r.toValues == "(1,'x,y'),(2,'z')")
  }

  test("/query serves every format spelling case-insensitively") {
    TableEnv.register(spark, sf)
    val exec = new QueryExecutor(spark, timeoutSec = 60)
    val srv = HealthServer.start(spark, GraftConfig(Map.empty), Some(exec))
    try {
      def get(fmt: String, sql: String): String = {
        val url = s"http://localhost:${srv.port}/query?format=$fmt&q=" +
          java.net.URLEncoder.encode(sql, "UTF-8")
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        val body = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        conn.disconnect()
        body
      }
      val sql = "SELECT 1 AS a, 'x' AS b"
      assert(get("TabSeparatedWithNames", sql) == "a\tb\n1\tx")
      assert(get("TSV", sql) == "1\tx")
      assert(get("Pretty", sql).startsWith("┌"))
      assert(get("Vertical", sql).contains("Row 1:"))
      assert(get("Values", sql) == "(1,'x')")
      assert(get("JSONEachRow", sql) == "{\"a\": 1, \"b\": \"x\"}")
      // the statement's own FORMAT clause selects when no param does,
      // like CH over HTTP; an explicit param still wins
      def getRaw(sql: String): String = {
        val url = s"http://localhost:${srv.port}/query?q=" +
          java.net.URLEncoder.encode(sql, "UTF-8")
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        val body = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        conn.disconnect()
        body
      }
      assert(getRaw("SELECT 1 AS a, 'x' AS b FORMAT TSVWithNames") ==
        "a\tb\n1\tx")
      assert(getRaw("SELECT 1 AS a FORMAT Values") == "(1)")
      assert(get("Values", "SELECT 2 AS a FORMAT Pretty") == "(2)")
    } finally srv.close()
  }
}
