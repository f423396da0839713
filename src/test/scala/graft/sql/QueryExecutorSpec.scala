package graft.sql

import java.util.concurrent.TimeoutException
import graft.SparkSpec

class QueryExecutorSpec extends SparkSpec {

  test("run returns columns + rows shape") {
    val ex = new QueryExecutor(spark, timeoutSec = 60)
    try {
      TableEnv.register(spark, sf)
      val r = ex.run("SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1")
      assert(r.columns == Seq("o_orderpriority", "n"))
      assert(r.rows.length == 5)
      assert(r.rows.forall(_.length == 2))
    } finally ex.close()
  }

  test("non-select is rejected before execution") {
    val ex = new QueryExecutor(spark)
    try intercept[ReadOnlyViolation](ex.run("DROP TABLE orders"))
    finally ex.close()
  }

  test("timeout cancels the query") {
    val ex = new QueryExecutor(spark, timeoutSec = 2)
    try {
      TableEnv.register(spark, sf)
      // A cartesian heavy enough to exceed 2s at local[4].
      intercept[TimeoutException](ex.run(
        """SELECT count(*) FROM lineitem a CROSS JOIN lineitem b
          |CROSS JOIN lineitem c""".stripMargin))
    } finally ex.close()
  }
}
