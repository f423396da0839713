package graft.functions

import graft.SparkSpec
import graft.sql.{QueryGuard, TableEnv}

/** ClickHouse `histogram(N)(x)` — the Ben-Haim/Tom-Tov adaptive
  * streaming histogram. Bin EDGES are input-order-sensitive by the
  * algorithm's contract (CH's too), so the pins are the deterministic
  * invariants: bin count, Σ height = row count, first lower = min,
  * last upper = max, monotone non-overlapping edges — plus a planted
  * bimodal fixture where the greedy compression provably separates
  * the clusters. */
class HistogramAggSpec extends SparkSpec {

  private def plan(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql)
  }

  test("invariants: N bins, heights sum to count, range is exact") {
    val r = plan(
      """SELECT size(h) AS nbins,
        |  aggregate(h, CAST(0.0 AS DOUBLE), (a, b) -> a + b.height) AS total,
        |  element_at(h, 1).lower AS lo,
        |  element_at(h, size(h)).upper AS hi,
        |  cnt, mn, mx
        |FROM (SELECT histogram(6)(o_totalprice) AS h,
        |        count(*) AS cnt, min(o_totalprice) AS mn,
        |        max(o_totalprice) AS mx
        |      FROM orders)""".stripMargin).collect().head
    assert(r.getInt(0) == 6)
    assert(math.abs(r.getDouble(1) - r.getLong(4)) < 1e-6)
    assert(r.getDouble(2) == r.getDouble(5)) // first lower = exact min
    assert(r.getDouble(3) == r.getDouble(6)) // last upper = exact max
  }

  test("edges are monotone and contiguous") {
    val bins = plan(
      "SELECT explode(h) AS b FROM (SELECT histogram(8)(o_totalprice) AS h FROM orders)")
      .selectExpr("b.lower", "b.upper", "b.height").collect()
    assert(bins.length == 8)
    bins.foreach { b =>
      assert(b.getDouble(0) <= b.getDouble(1))
      assert(b.getDouble(2) > 0)
    }
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(1) == b.getDouble(0)) // upper(i) == lower(i+1)
    }
  }

  test("merge-order independence of the pinned invariants") {
    // same data through 1 partition and through many: totals, range
    // and bin count agree (edges may differ — the documented contract)
    def run(parts: Int) = plan(
      s"""SELECT size(h) AS n,
         |  aggregate(h, CAST(0.0 AS DOUBLE), (a, b) -> a + b.height) AS t,
         |  element_at(h, 1).lower AS lo, element_at(h, size(h)).upper AS hi
         |FROM (SELECT histogram(5)(l_quantity) AS h
         |      FROM (SELECT l_quantity FROM lineitem
         |            DISTRIBUTE BY l_orderkey % $parts))""".stripMargin)
      .collect().head
    val a = run(1)
    val b = run(7)
    assert(a.getInt(0) == b.getInt(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
    assert(a.getDouble(2) == b.getDouble(2) && a.getDouble(3) == b.getDouble(3))
  }

  test("bimodal fixture: two clusters land in two clean bins") {
    val r = plan(
      """SELECT element_at(h, 1).height AS h1, element_at(h, 2).height AS h2,
        |  element_at(h, 1).lower AS lo, element_at(h, 2).upper AS hi
        |FROM (SELECT histogram(2)(x) AS h FROM
        |  (SELECT CAST(v AS DOUBLE) AS x FROM
        |    VALUES (1), (2), (3), (101), (102), (103) t(v)))""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 103.0)
  }

  test("non-constant or missing bin count rejects loudly") {
    val e = intercept[Exception] {
      plan("SELECT histogram(o_orderkey)(o_totalprice) AS h FROM orders")
        .collect()
    }
    assert(e.getMessage != null)
  }
}
