package graft.ops

import graft.SparkSpec

class HealthSpec extends SparkSpec {

  private def httpGet(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    conn.disconnect()
    (code, body)
  }

  test("health check reports OK with engine version on a live session") {
    val s = Health.check(spark)
    assert(s.ok)
    assert(s.message.startsWith("OK - Connected to Spark "))
    assert(s.message.contains(spark.version))
  }

  test("served /health returns 200 + version on a live session") {
    val srv = HealthServer.start(spark, GraftConfig(Map.empty))
    try {
      val (code, body) = httpGet(s"http://localhost:${srv.port}/health")
      assert(code == 200)
      assert(body == s"OK - Connected to Spark ${spark.version}")
    } finally srv.close()
  }

  test("served /health returns 503 when the engine is disabled") {
    val srv = HealthServer.start(spark,
      GraftConfig(Map("SPARK_GRAFT_ENABLED" -> "false")))
    try {
      val (code, body) = httpGet(s"http://localhost:${srv.port}/health")
      assert(code == 503)
      assert(body.startsWith("ERROR - "))
    } finally srv.close()
  }

  test("served /query runs guarded SQL and shapes errors as JSON") {
    graft.sql.TableEnv.register(spark, sf)
    val exec = new graft.sql.QueryExecutor(spark, timeoutSec = 60)
    val srv = HealthServer.start(spark, GraftConfig(Map.empty), Some(exec))
    try {
      val base = s"http://localhost:${srv.port}/query"
      val sql = "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"
      val (code, body) = httpGet(
        base + "?q=" + java.net.URLEncoder.encode(sql, "UTF-8"))
      assert(code == 200)
      assert(body.startsWith("""{"columns": ["o_orderpriority", "n"]"""))
      assert(body.contains("\"rows\": ["))
      // guard violation surfaces as a structured 400, not a crash
      val (badCode, badBody) = httpGet(
        base + "?q=" + java.net.URLEncoder.encode("DROP TABLE orders", "UTF-8"))
      assert(badCode == 400)
      assert(badBody.contains("\"status\": \"error\""))
      assert(badBody.contains("read-only"))
      // empty query
      assert(httpGet(base)._1 == 400)
    } finally { srv.close(); exec.close() }
  }

  test("/query format=csv renders CSVWithNames with RFC-4180 quoting") {
    graft.sql.TableEnv.register(spark, sf)
    val exec = new graft.sql.QueryExecutor(spark, timeoutSec = 60)
    val srv = HealthServer.start(spark, GraftConfig(Map.empty), Some(exec))
    try {
      val sql =
        "SELECT 'a,b' AS tricky, 'plain' AS p, NULL AS n, 'say \"hi\"' AS q"
      val (code, body) = httpGet(s"http://localhost:${srv.port}/query" +
        "?format=csv&q=" + java.net.URLEncoder.encode(sql, "UTF-8"))
      assert(code == 200)
      val lines = body.split("\n")
      assert(lines(0) == "tricky,p,n,q")
      assert(lines(1) == "\"a,b\",plain,,\"say \"\"hi\"\"\"")
    } finally { srv.close(); exec.close() }
  }

  test("served /explain returns the formatted plan without running jobs") {
    graft.sql.TableEnv.register(spark, sf)
    val exec = new graft.sql.QueryExecutor(spark, timeoutSec = 60)
    val srv = HealthServer.start(spark, GraftConfig(Map.empty), Some(exec))
    try {
      val base = s"http://localhost:${srv.port}/explain"
      val sql = "SELECT count(*) FROM orders WHERE o_totalprice > 100"
      val (code, body) = httpGet(
        base + "?q=" + java.net.URLEncoder.encode(sql, "UTF-8"))
      assert(code == 200)
      assert(body.contains("Physical Plan"))
      assert(body.contains("PushedFilters"), body.take(400)) // plan, not prose
      // same guard as /query
      val (badCode, badBody) = httpGet(
        base + "?q=" + java.net.URLEncoder.encode("DROP TABLE orders", "UTF-8"))
      assert(badCode == 400 && badBody.contains("read-only"))
      assert(httpGet(base)._1 == 400)
    } finally { srv.close(); exec.close() }
  }

  test("served catalog endpoints mirror the reference tools") {
    val cat = new graft.catalog.GraftCatalog(spark, sf)
    val srv = HealthServer.start(spark, GraftConfig(Map.empty), None, Some(cat))
    try {
      val (dbCode, dbBody) = httpGet(s"http://localhost:${srv.port}/databases")
      assert(dbCode == 200 && dbBody == """{"databases": ["default"]}""")
      val (tCode, tBody) = httpGet(
        s"http://localhost:${srv.port}/tables?like=ord%25&page_size=5")
      assert(tCode == 200)
      assert(tBody.contains("\"name\": \"orders\""))
      assert(tBody.contains("\"create_table_query\": \"CREATE TABLE default.orders ("))
      assert(tBody.contains("\"total_tables\": 1"))
      assert(tBody.contains("\"column_type\""))
      // unknown database → structured 400, like the query endpoint
      val (badCode, badBody) = httpGet(
        s"http://localhost:${srv.port}/tables?database=prod")
      assert(badCode == 400 && badBody.contains("Unknown database"))
    } finally srv.close()
  }

  test("config reads SPARK_GRAFT_* envs with reference defaults") {
    val dflt = GraftConfig(Map.empty)
    assert(dflt.enabled && dflt.queryTimeoutSec == 30 && dflt.poolSize == 10)
    assert(dflt.maxRows == graft.sql.QueryExecutor.DefaultMaxRows)
    assert(dflt.dataDir.isEmpty)
    val set = GraftConfig(Map(
      "SPARK_GRAFT_QUERY_TIMEOUT_SEC" -> "5",
      "SPARK_GRAFT_MAX_ROWS" -> "7",
      "SPARK_GRAFT_SF_DIR" -> "/data/sf1"))
    assert(set.queryTimeoutSec == 5 && set.maxRows == 7)
    assert(set.dataDir.contains("/data/sf1"))
    // common truthy/falsy env spellings parse; junk is rejected loudly
    for (v <- Seq("true", "1", "yes", "on", "TRUE"))
      assert(GraftConfig(Map("SPARK_GRAFT_ENABLED" -> v)).enabled, v)
    for (v <- Seq("false", "0", "no", "off"))
      assert(!GraftConfig(Map("SPARK_GRAFT_ENABLED" -> v)).enabled, v)
    intercept[IllegalArgumentException] {
      GraftConfig(Map("SPARK_GRAFT_ENABLED" -> "maybe")).enabled
    }
    // a config-built executor enforces the configured cap
    graft.sql.TableEnv.register(spark, sf)
    val ex = set.newExecutor(spark)
    try {
      val r = ex.run("SELECT n_nationkey FROM nation")
      assert(r.rows.length == 7 && r.truncated)
    } finally ex.close()
  }
}
