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
