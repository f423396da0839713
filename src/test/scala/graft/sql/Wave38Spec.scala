package graft.sql

import graft.SparkSpec
import graft.functions.CHFunctions

/** Wave-38 paste shims: PREWHERE merging with an explicit WHERE, and
  * the select-item arrayJoin() call grouping on its own alias. */
class Wave38Spec extends SparkSpec {

  private def rows(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect()
  }

  test("PREWHERE and WHERE in one statement AND together") {
    val merged = rows(
      """SELECT count() AS n FROM orders
        |PREWHERE o_orderdate >= toDate('1996-01-01')
        |WHERE o_totalprice > 100 OR o_totalprice < 50""".stripMargin)
      .head.getLong(0)
    val explicit = rows(
      """SELECT count() AS n FROM orders
        |WHERE o_orderdate >= toDate('1996-01-01')
        |  AND (o_totalprice > 100 OR o_totalprice < 50)""".stripMargin)
      .head.getLong(0)
    // the OR must bind INSIDE the merged conjunct (precedence trap)
    assert(merged == explicit && merged > 0)
    val tail = rows(
      """SELECT o_orderstatus, count() AS n FROM orders
        |PREWHERE o_orderkey % 2 = 0 WHERE o_totalprice > 100
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    assert(tail.nonEmpty)
  }

  test("bare USING lists gain parens; lateral aliases inline into windows") {
    val r = rows(
      """SELECT t1.a AS a FROM (SELECT 1 AS a) t1
        |ANY LEFT JOIN (SELECT 1 AS a, 2 AS b) t2 USING a""".stripMargin)
    assert(r.head.getInt(0) == 1)
    val w = rows(
      """SELECT o_orderstatus AS s, count() AS c,
        |  round(c / sum(c) OVER (), 4) AS share
        |FROM orders GROUP BY s ORDER BY s""".stripMargin)
    assert(w.map(_.getDouble(2)).sum > 0.999) // shares sum to 1
    // chains: an alias used by an alias used in a window
    val chain = rows(
      """SELECT count() AS c, c * 2 AS c2,
        |  c2 / sum(c2) OVER () AS one
        |FROM orders""".stripMargin)
    assert(chain.head.getDouble(2) == 1.0)
  }

  test("arrayJoin select item groups on its own alias") {
    val r = rows(
      """SELECT arrayJoin([1, 2, 2, 3]) AS v, count() AS c
        |FROM system.one GROUP BY v ORDER BY v""".stripMargin)
    assert(r.map(x => (x.getInt(0), x.getLong(1))).toSeq ==
      Seq((1, 1L), (2, 2L), (3, 1L)))
    // without GROUP BY the generator plans untouched
    val plain = rows(
      "SELECT arrayJoin([1, 2, 3]) AS v FROM system.one ORDER BY v")
    assert(plain.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }
}
