package graft.functions

import graft.SparkSpec
import graft.sql.{QueryGuard, TableEnv}

/** Wave-28 value pins for the shapes the DuckDB oracle cannot express
  * (struct-of-arrays map aggregates, typed JSON maps, the tuple-form
  * geo test's edge directions). */
class Wave28Spec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect().head
  }

  test("sumMap/maxMap accept both the (keys, vals) and MAP forms") {
    val r = one(
      """SELECT sumMap([k], [v]) AS a, sumMap(map(k, v)) AS b
        |FROM (SELECT 'x' AS k, 2 AS v UNION ALL SELECT 'x', 3
        |      UNION ALL SELECT 'y', 5)""".stripMargin)
    assert(r.get(0) == r.get(1))
    val st = r.getStruct(0)
    assert(st.getSeq[String](0) == Seq("x", "y"))
    assert(st.getSeq[Long](1) == Seq(5L, 5L))
  }

  test("JSONExtract: typed scalars, arrays, 1-based index, KeysAndValues") {
    val r = one(
      """SELECT JSONExtract('{"a": 7}', 'a', 'Int64') AS i,
        |  JSONExtract('{"a": [1, 2]}', 'a', 'Array(Int64)') AS arr,
        |  JSONExtract('[10, 20, 30]', 2, 'Int64') AS idx,
        |  JSONExtract('{"f": 1.5}', 'f', 'Float64') AS f,
        |  JSONExtract('{"s": "x"}', 's', 'String') AS s,
        |  JSONExtractKeysAndValues('{"a": 1, "b": 2}', 'Int64') AS kv""".stripMargin)
    assert(r.getLong(0) == 7L)
    assert(r.getSeq[Long](1) == Seq(1L, 2L))
    assert(r.getLong(2) == 20L) // CH indices are 1-based
    assert(r.getDouble(3) == 1.5)
    assert(r.getString(4) == "x")
    val kv = r.getSeq[org.apache.spark.sql.Row](5)
    assert(kv.map(e => (e.getString(0), e.getLong(1))).toSet ==
      Set(("a", 1L), ("b", 2L)))
  }

  test("JSONExtract rejects an unsupported type loudly") {
    val e = intercept[Exception](
      one("SELECT JSONExtract('{}', 'a', 'AggregateFunction(sum)') AS x"))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("pointInPolygon: tuple form, 4-arg form, and concave vertices agree") {
    val r = one(
      """SELECT pointInPolygon((3.0, 3.0), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS t1,
        |  pointInPolygon(3.0, 3.0, [6.0, 8.0, 5.0, 0.0], [0.0, 4.0, 8.0, 2.0]) AS t2,
        |  pointInPolygon((7.9, 0.1), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS outside_near
        |""".stripMargin)
    assert(r.getBoolean(0) && r.getBoolean(1))
    assert(!r.getBoolean(2)) // just outside the first edge
  }

  test("sparkbar: aggregate forms (count, weighted, bounded) render") {
    val r = one(
      """SELECT sparkbar(4, 0, 100)(x, y) AS bounded,
        |  sparkbar(2)(x, y) AS auto
        |FROM (SELECT 10.0 AS x, 5.0 AS y UNION ALL SELECT 80.0, 20.0)""".stripMargin)
    assert(r.getString(0) == "▂  █") // slot sums 5 and 20
    assert(r.getString(1) == "▂█")
    // the scalar array-render helper keeps working
    val s2 = one("SELECT sparkbar([1, 4, 8]) AS s")
    assert(s2.getString(0).length == 3)
  }

  test("minSampleSize power analysis matches the closed forms") {
    val r = one(
      """SELECT minSampleSizeConversion(0.25, 0.03, 0.8, 0.05) AS mc,
        |  minSampleSizeContinuous(200.0, 50.0, 0.05, 0.8, 0.05) AS ms""".stripMargin)
    val mc = r.getStruct(0)
    assert(math.abs(mc.getDouble(0) - 3393.33) < 1.0) // (1.96+0.8416)^2*(p1q1+p2q2)/mde^2
    assert(mc.getDouble(1) == 0.22 && mc.getDouble(2) == 0.28)
    val ms = r.getStruct(1)
    assert(math.abs(ms.getDouble(0) - 392.44) < 1.0) // 2*(za+zb)^2*sigma^2/(base*mde)^2
    assert(ms.getDouble(1) == 190.0 && ms.getDouble(2) == 210.0)
  }

  test("quantileInterpolatedWeighted weights shift the quantile") {
    val r = one(
      """SELECT quantileInterpolatedWeighted(0.5)(v, w) AS q
        |FROM (SELECT 1.0 AS v, 1 AS w UNION ALL SELECT 10.0, 8
        |      UNION ALL SELECT 100.0, 1)""".stripMargin)
    assert(r.getDouble(0) == 10.0) // the heavy middle value is the median
  }
}
