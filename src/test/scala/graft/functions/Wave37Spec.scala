package graft.functions

import graft.SparkSpec
import graft.sql.{QueryGuard, TableEnv}

/** Wave-37 value pins: PR-AUC (the CH doc example), Cartesian polygon
  * measures with holes, WKT both directions, plural weighted
  * quantiles, sub-second chrono arithmetic and timezone offsets. */
class Wave37Spec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect().head
  }

  test("arrayPrAUC matches the ClickHouse doc example; class-absent is NaN") {
    val r = one(
      """SELECT arrayPrAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) AS pr,
        |  arrayAUCPR([0.1, 0.4], [0, 0]) AS nopos,
        |  arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) AS roc""".stripMargin)
    assert(math.abs(r.getDouble(0) - 0.8333333333333333) < 1e-12)
    assert(r.getDouble(1).isNaN)
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-12)
  }

  test("polygon area subtracts holes; perimeter adds every boundary") {
    val r = one(
      """SELECT polygonAreaCartesian([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]) AS a,
        |  polygonAreaCartesian([
        |    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
        |    [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]]) AS holed,
        |  polygonPerimeterCartesian([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]) AS p""".stripMargin)
    assert(r.getDouble(0) == 100.0)
    assert(r.getDouble(1) == 96.0) // 100 - 4
    assert(r.getDouble(2) == 40.0)
  }

  test("wkt renders every geometry depth; readWKT* parse back") {
    val r = one(
      """SELECT wkt((1.0, 2.5)) AS pt,
        |  wkt([(0.0, 0.0), (10.0, 0.0)]) AS ls,
        |  wkt([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]]) AS poly,
        |  readWKTPoint('POINT (1.5 -2)') AS rp,
        |  wkt(readWKTRing('POLYGON((0 0, 3 0, 3 3))')) AS rt,
        |  wkt([readWKTRing('POLYGON((0 0, 3 0, 3 3))')]) AS rt2""".stripMargin)
    assert(r.getString(0) == "POINT(1 2.5)")
    assert(r.getString(1) == "LINESTRING(0 0,10 0)")
    assert(r.getString(2) == "POLYGON((0 0,10 0,10 10))")
    val p = r.getStruct(3)
    assert(p.getDouble(0) == 1.5 && p.getDouble(1) == -2.0)
    // Ring and LineString share one structural type (Array(Point)):
    // depth-1 renders LINESTRING; wrap once for the POLYGON form
    assert(r.getString(4) == "LINESTRING(0 0,3 0,3 3)")
    assert(r.getString(5) == "POLYGON((0 0,3 0,3 3))")
  }

  test("plural weighted quantiles agree with their singular spellings") {
    val r = one(
      """SELECT quantilesExactWeighted(0.25, 0.75)(o_totalprice, 2) AS qs,
        |  quantileExactWeighted(0.25)(o_totalprice, 2) AS q25,
        |  quantileExactWeighted(0.75)(o_totalprice, 2) AS q75,
        |  quantilesTDigestWeighted(0.5)(o_totalprice, 1) AS qt,
        |  quantileTDigestWeighted(0.5)(o_totalprice, 1) AS qt1
        |FROM orders""".stripMargin)
    assert(r.getSeq[Double](0) == Seq(r.getDouble(1), r.getDouble(2)))
    assert(r.getSeq[Double](3).head == r.getDouble(4))
  }

  test("sub-second chrono arithmetic and timeZoneOffset") {
    val r = one(
      """SELECT toString(addMilliseconds(toDateTime('2024-03-15 07:08:09'), 125)) AS ms,
        |  toString(subtractMicroseconds(toDateTime64('2024-03-15 07:08:09.000500', 6), 400)) AS us,
        |  timeZoneOffset(toDateTime('2024-07-01 12:00:00')) AS sess,
        |  timeZoneOffset(toDateTime('2024-07-01 12:00:00'), 'Asia/Kathmandu') AS ktm,
        |  toString(toTimeWithFixedDate(toDateTime('2024-03-15 07:08:09'),
        |    toDate('1999-12-31'))) AS fixed""".stripMargin)
    assert(r.getString(0) == "2024-03-15 07:08:09.125")
    assert(r.getString(1) == "2024-03-15 07:08:09.0001")
    assert(r.getLong(2) == 0L) // session runs UTC
    assert(r.getLong(3) == 5L * 3600 + 45 * 60) // +05:45
    assert(r.getString(4) == "1999-12-31 07:08:09")
  }
}
