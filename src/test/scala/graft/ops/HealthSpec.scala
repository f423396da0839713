package graft.ops

import graft.SparkSpec

class HealthSpec extends SparkSpec {
  test("health check reports OK with engine version on a live session") {
    val s = Health.check(spark)
    assert(s.ok)
    assert(s.message.startsWith("OK - Connected to Spark "))
    assert(s.message.contains(spark.version))
  }
}
