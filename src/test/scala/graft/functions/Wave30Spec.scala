package graft.functions

import graft.SparkSpec
import graft.sql.{QueryGuard, TableEnv}

/** Wave-30 value pins: chrono constructors, the hash spellings with
  * exact contracts (hiveHash), bit/byte manipulation, geo ellipses,
  * the nonNegativeDerivative window rewrite, and sequenceNextNode's
  * anchor/chain semantics (doc-example fixture). */
class Wave30Spec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect().head
  }

  private def rows(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect()
  }

  test("makeDateTime/makeDateTime64 and the day-of-year makeDate form") {
    val r = one(
      """SELECT toString(makeDateTime(2024, 3, 15, 7, 8, 9)) AS dt,
        |  toString(makeDateTime64(2024, 3, 15, 7, 8, 9, 125)) AS dt64,
        |  toString(makeDate(2024, 75)) AS doy,
        |  toString(makeDate(2023, 32)) AS feb""".stripMargin)
    assert(r.getString(0) == "2024-03-15 07:08:09")
    assert(r.getString(1) == "2024-03-15 07:08:09.125")
    assert(r.getString(2) == "2024-03-15") // 31 + 29 + 15 in a leap year
    assert(r.getString(3) == "2023-02-01")
  }

  test("hiveHash is Hive's exact string hash; hash spellings disperse") {
    val r = one(
      """SELECT hiveHash('abc') AS hh,
        |  murmurHash3_64('graft') AS m364, murmurHash2_64('graft') AS m264,
        |  murmurHash2_32('graft') AS m232, kafkaMurmurHash('graft') AS kmh,
        |  length(murmurHash3_128('graft')) AS len128""".stripMargin)
    assert(r.getInt(0) == 96354) // Java "abc".hashCode
    assert(r.getLong(1) != r.getLong(2))
    assert(r.getInt(3) != r.getInt(4))
    assert(r.getLong(5) == 32L) // 128-bit hex
  }

  test("byteSwap dispatches on the argument's own width") {
    val r = one(
      """SELECT byteSwap(65536) AS i32, byteSwap(CAST(258 AS SMALLINT)) AS i16,
        |  byteSwap(CAST(1 AS BIGINT)) AS i64""".stripMargin)
    // the r18 width-aware carrier is Int64; widths still dispatch on
    // the argument (bare 65536 types as CH UInt32, casts keep theirs)
    assert(r.getLong(0) == 256L) // 0x00010000 -> 0x00000100
    assert(r.getLong(1) == java.lang.Short.reverseBytes(258.toShort).toLong)
    assert(r.getLong(2) == java.lang.Long.reverseBytes(1L))
  }

  test("bitSlice packs MSB-first with zero padding") {
    val r = one(
      """SELECT bitSlice('Hello', 1, 8) AS first_byte,
        |  bitSlice('Hello', 9, 8) AS second_byte,
        |  bitSlice('H', 1, 4) AS high_nibble,
        |  bitSlice('Hello', -8) AS tail""".stripMargin)
    assert(r.getString(0) == "H")
    assert(r.getString(1) == "e")
    // 'H' = 0b0100_1000; top 4 bits zero-padded -> 0b0100_0000 = '@'
    assert(r.getString(2) == "@")
    assert(r.getString(3) == "o")
  }

  test("greatCircleAngle and pointInEllipses") {
    val r = one(
      """SELECT greatCircleAngle(0.0, 0.0, 0.0, 90.0) AS quarter,
        |  pointInEllipses(10.0, 10.0, 10.0, 9.1, 1.0, 0.9999) AS inside,
        |  pointInEllipses(10.0, 10.0, 3.0, 3.0, 1.0, 1.0) AS outside,
        |  pointInEllipses(10.0, 10.0, 3.0, 3.0, 1.0, 1.0,
        |                  10.0, 9.5, 2.0, 2.0) AS second_hits""".stripMargin)
    assert(math.abs(r.getDouble(0) - 90.0) < 0.01)
    assert(r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3))
  }

  test("countDigits and toDecimalString") {
    val r = one(
      """SELECT countDigits(toDecimal64(12.345, 3)) AS cd,
        |  countDigits(42) AS ci, countDigits(0) AS cz,
        |  toDecimalString(64.32, 5) AS ds""".stripMargin)
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 1)
    assert(r.getString(3) == "64.32000")
  }

  test("generateSnowflakeID round-trips through snowflakeIDToDateTime") {
    val r = one(
      """SELECT s > 0 AS pos,
        |  abs(unix_timestamp(snowflakeIDToDateTime(s)) - unix_timestamp(now())) AS drift
        |FROM (SELECT generateSnowflakeID() AS s)""".stripMargin)
    assert(r.getBoolean(0))
    assert(r.getLong(1) <= 60L)
  }

  test("nonNegativeDerivative: per-second rate, clamped, first row 0") {
    val rs = rows(
      """SELECT nonNegativeDerivative(v, t) OVER (ORDER BY t) AS d
        |FROM (SELECT timestamp_seconds(100) AS t, 1.0 AS v
        |  UNION ALL SELECT timestamp_seconds(101), 2.0
        |  UNION ALL SELECT timestamp_seconds(103), 8.0
        |  UNION ALL SELECT timestamp_seconds(104), 5.0)
        |ORDER BY d""".stripMargin)
    assert(rs.map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 0.0, 1.0, 3.0))
  }

  test("nonNegativeDerivative scales by the interval argument") {
    val rs = rows(
      """SELECT nonNegativeDerivative(v, t, INTERVAL 10 SECOND) OVER (ORDER BY t) AS d
        |FROM (SELECT timestamp_seconds(100) AS t, 1.0 AS v
        |  UNION ALL SELECT timestamp_seconds(102), 2.0)""".stripMargin)
    assert(rs.map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 5.0))
    val e = intercept[Exception](one("SELECT nonNegativeDerivative(1.0, now())"))
    assert(e.getMessage.contains("OVER"))
  }

  test("sequenceNextNode: the ClickHouse doc walk (forward/head)") {
    val fixture =
      """(SELECT timestamp_seconds(1) AS t, 'A' AS id, 'Home' AS page
        | UNION ALL SELECT timestamp_seconds(2), 'A', 'Gift'
        | UNION ALL SELECT timestamp_seconds(3), 'A', 'Exit'
        | UNION ALL SELECT timestamp_seconds(1), 'B', 'Home'
        | UNION ALL SELECT timestamp_seconds(2), 'B', 'Home'
        | UNION ALL SELECT timestamp_seconds(3), 'B', 'Gift'
        | UNION ALL SELECT timestamp_seconds(4), 'B', 'Basket')"""
    val rs = rows(
      s"""SELECT id, sequenceNextNode('forward', 'head')(
         |    t, page, page = 'Home', page = 'Home', page = 'Gift') AS nxt
         |FROM $fixture GROUP BY id ORDER BY id""".stripMargin)
    // A: Home -> Gift matched at the head; next is Exit.
    // B: head chain needs Home, Gift at positions 1, 2 but row 2 is
    //    Home -> no match.
    assert(rs.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("A", "Exit"), ("B", null)))
  }

  test("sequenceNextNode: first_match and backward/tail anchors") {
    val fixture =
      """(SELECT timestamp_seconds(1) AS t, 'Exit' AS page
        | UNION ALL SELECT timestamp_seconds(2), 'Home'
        | UNION ALL SELECT timestamp_seconds(3), 'Gift'
        | UNION ALL SELECT timestamp_seconds(4), 'Basket')"""
    val r1 = one(
      s"""SELECT sequenceNextNode('forward', 'first_match')(
         |    t, page, 1, page = 'Home', page = 'Gift') AS nxt
         |FROM $fixture""".stripMargin)
    assert(r1.getString(0) == "Basket")
    // backward from the time-last event: Basket, Gift -> next is Home
    val r2 = one(
      s"""SELECT sequenceNextNode('backward', 'tail')(
         |    t, page, 1, page = 'Basket', page = 'Gift') AS nxt
         |FROM $fixture""".stripMargin)
    assert(r2.getString(0) == "Home")
  }

  test("sequenceNextNode survives partial-aggregation merges") {
    // 40 users, events spread over the orders table's partitions
    val rs = rows(
      """SELECT o_custkey % 5 AS g, sequenceNextNode('forward', 'head')(
        |    timestamp_seconds(o_orderkey), toString(o_orderkey % 7),
        |    1, 1) AS nxt
        |FROM orders GROUP BY o_custkey % 5 ORDER BY g""".stripMargin)
    assert(rs.length == 5 && rs.forall(_.getString(1) != null))
  }
}
