package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class JdbcSpec extends AnyFunSuite {

  test("clickhouse url selects the clickhouse driver and keeps auth") {
    val o = Jdbc.options("jdbc:clickhouse://ch:8123/default", "events",
      user = Some("u"), password = Some("p"))
    assert(o("driver") == "com.clickhouse.jdbc.ClickHouseDriver")
    assert(o("dbtable") == "events" && o("user") == "u" && o("password") == "p")
  }

  test("partitioned read emits bounded-range options") {
    val o = Jdbc.options("jdbc:postgresql://x/db", "t",
      partitioning = Some(Jdbc.Partitioning("id", 0, 1000000, 32)))
    assert(!o.contains("driver")) // scheme-resolved
    assert(o("partitionColumn") == "id")
    assert(o("lowerBound") == "0" && o("upperBound") == "1000000")
    assert(o("numPartitions") == "32")
  }
}

/** Live partitioned round-trip against embedded Derby — proves the
  * option plumbing drives a real server-side read, with the partitioned
  * path issuing one bounded-range query per partition. */
class JdbcLiveSpec extends graft.SparkSpec {

  test("partitioned read returns every row exactly once") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE live_t (id INT, v VARCHAR(10))")
      val ps = conn.prepareStatement("INSERT INTO live_t VALUES (?, ?)")
      (0 until 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"v$i"); ps.addBatch()
      }
      ps.executeBatch()
      st.close()
    } finally conn.close()
    val df = Jdbc.read(spark, url, "live_t",
      partitioning = Some(Jdbc.Partitioning("id", 0, 100, 4)))
    assert(df.rdd.getNumPartitions == 4) // one range query per partition
    assert(df.count() == 100)
    assert(df.select("id").distinct().count() == 100) // no overlap, no loss
  }
}
