package graft.sql

import graft.SparkSpec
import graft.functions.CHFunctions

/** Registry-wide regression net for the r18 judge's finding class:
  * a chrono builder that ACCEPTS a trailing timezone argument but
  * consumes only `es.head` silently drops the zone. For every
  * timezone-honoring extractor the engine documents, evaluate the
  * 1-arg and 2-arg forms on an instant chosen so that the zone shift
  * MUST change the answer (2023-12-31 22:30:10 UTC rolls
  * day/month/year in Asia/Kathmandu, +05:45, and the :45 offset
  * moves the minute too) — equal answers mean the zone was dropped.
  * The arity sweep in ParamFormSpec probes 0 and 9 arguments; this
  * one pins the documented OPTIONAL arity the class hid in. */
class ChronoTzSweepSpec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect().head
  }

  private val ts = "toDateTime('2023-12-31 22:30:10')"
  private val tz = "'Asia/Kathmandu'"

  /** tz as the 2nd argument; every answer must move under +05:45. */
  private val arity2 = Seq(
    "toYear", "toQuarter", "toMonth", "toDayOfYear", "toDayOfMonth",
    "toHour", "toMinute", "toISOWeek", "toISOYear", "toMonday",
    "toLastDayOfMonth", "toYYYYMM", "toYYYYMMDD", "toYYYYMMDDhhmmss",
    "toDate", "toDate32", "toRelativeDayNum", "toRelativeHourNum",
    "toRelativeMinuteNum", "toRelativeMonthNum", "toRelativeYearNum",
    // (toStartOfMinute / the 5-15-30-min slots are OFFSET-INVARIANT —
    // every real zone offset is a whole multiple of 15 minutes — so
    // equality there proves nothing; their zone plumbing is pinned by
    // the wave-27 value test instead)
    "toStartOfDay", "toStartOfHour",
    "toStartOfMonth", "toStartOfQuarter", "toStartOfYear",
    "monthName", "toTime")

  /** tz as the 3rd argument, after a mode/unit/interval. */
  private val arity3 = Seq(
    s"toDayOfWeek($ts, 0, TZ)" -> s"toDayOfWeek($ts, 0)",
    s"toStartOfWeek($ts, 1, TZ)" -> s"toStartOfWeek($ts, 1)",
    s"toLastDayOfWeek($ts, 1, TZ)" -> s"toLastDayOfWeek($ts, 1)",
    s"toWeek($ts, 3, TZ)" -> s"toWeek($ts, 3)",
    s"toYearWeek($ts, 3, TZ)" -> s"toYearWeek($ts, 3)",
    s"dateName('day', $ts, TZ)" -> s"dateName('day', $ts)",
    s"toStartOfInterval($ts, INTERVAL 1 DAY, TZ)" ->
      s"toStartOfInterval($ts, INTERVAL 1 DAY)")

  test("every 2-arg timezone extractor moves under Asia/Kathmandu") {
    val plain = one(s"SELECT ${arity2.map(f => s"toString($f($ts))")
      .mkString(", ")}")
    val zoned = one(s"SELECT ${arity2.map(f => s"toString($f($ts, $tz))")
      .mkString(", ")}")
    arity2.indices.foreach { i =>
      assert(plain.getString(i) != zoned.getString(i),
        s"${arity2(i)}: the timezone argument changed nothing " +
          s"(both '${plain.getString(i)}') — silently dropped?")
    }
  }

  test("every 3rd-slot timezone form moves under Asia/Kathmandu") {
    arity3.foreach { case (zoned, plain) =>
      val z = one(s"SELECT toString(${zoned.replace("TZ", tz)}) AS v")
        .getString(0)
      val p = one(s"SELECT toString($plain) AS v").getString(0)
      assert(z != p,
        s"$zoned: the timezone argument changed nothing (both '$p')")
    }
  }

  test("epoch-bridge display timezones shift the wall clock") {
    // fromUnixTimestamp64* and snowflakeToDateTime* take an optional
    // display zone (instants shift, the toDateTime(epoch, tz)
    // contract); Kathmandu's :45 cannot be faked by a dropped zone
    val r = one(
      """SELECT
        |  toString(fromUnixTimestamp64Milli(1704067200123,
        |    'Asia/Kathmandu')) AS ms,
        |  toString(fromUnixTimestamp64Second(1704067200,
        |    'Asia/Kathmandu')) AS s,
        |  toString(fromUnixTimestamp64Nano(1704067200123456000,
        |    'Asia/Kathmandu')) AS ns,
        |  toString(snowflakeToDateTime(
        |    dateTimeToSnowflake(toDateTime('2024-01-01 00:00:00')),
        |    'Asia/Kathmandu')) AS sf,
        |  toString(snowflakeIDToDateTime(
        |    dateTimeToSnowflakeID(toDateTime('2024-01-01 00:00:00')),
        |    1288834974657, 'Asia/Kathmandu')) AS sfid""".stripMargin)
    assert(r.getString(0) == "2024-01-01 05:45:00.123")
    assert(r.getString(1) == "2024-01-01 05:45:00")
    assert(r.getString(2) == "2024-01-01 05:45:00.123456")
    assert(r.getString(3) == "2024-01-01 05:45:00")
    assert(r.getString(4) == "2024-01-01 05:45:00")
  }

  test("dateDiff/age 4th-argument zone moves a calendar-unit answer") {
    val r = one(
      s"""SELECT dateDiff('day', toDateTime('2023-12-31 10:00:00'),
         |    $ts) AS plain,
         |  dateDiff('day', toDateTime('2023-12-31 10:00:00'),
         |    $ts, $tz) AS zoned,
         |  age('year', toDateTime('2023-12-30 10:00:00'),
         |    toDateTime('2024-12-31 20:00:00'), $tz) AS aged""".stripMargin)
    assert(r.get(0).toString == "0")
    assert(r.get(1).toString == "1") // 22:30 UTC is already Jan 1 KTM
    assert(r.get(2).toString == "1")
  }
}
