package graft.functions

import graft.SparkSpec
import graft.sql.{QueryGuard, TableEnv}

/** Wave-31 value pins: the completed OrNull/OrZero conversion family
  * (parse failure vs range wrap), multi-byte char(), token/quoting
  * string helpers, URL-safe base64, the aes encrypt/decrypt bridge,
  * and the assertion/introspection stragglers. */
class Wave31Spec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect().head
  }

  test("OrNull/OrZero: parse failure nulls/zeroes, range wraps like the plain form") {
    val r = one(
      """SELECT toUInt8OrNull('300') AS wrap300, toUInt8OrNull('abc') AS bad,
        |  toInt8OrNull('-130') AS wrapneg, toUInt16OrZero('x') AS z16,
        |  toUInt32OrNull('4294967297') AS wrap32, toFloat32OrZero('bad') AS zf,
        |  toUInt64OrNull('42') AS ok64""".stripMargin)
    assert(r.getShort(0) == 44) // 300 mod 256, same as toUInt8(300)
    assert(r.isNullAt(1))
    assert(r.getByte(2) == 126) // -130 wraps into Int8 like toInt8
    assert(r.getInt(3) == 0)
    assert(r.getLong(4) == 1L)
    assert(r.getFloat(5) == 0.0f)
    assert(r.getLong(6) == 42L)
  }

  test("OrDefault conversions and the wide-integer decimal lanes") {
    val r = one(
      """SELECT toUInt8OrDefault('300', CAST(9 AS SMALLINT)) AS wrap,
        |  toUInt8OrDefault('bad', CAST(9 AS SMALLINT)) AS dflt,
        |  toDateOrDefault('nope', toDate('2000-01-01')) AS d,
        |  accurateCastOrDefault(300, 'UInt8', CAST(7 AS SMALLINT)) AS acc,
        |  toInt128(42) AS i128, toUInt256('99999999999999999999') AS u256,
        |  toString(parseDateTime64BestEffort('2024-03-15 07:08:09.125')) AS p""".stripMargin)
    assert(r.getShort(0) == 44) // parse ok -> the plain wrap, not default
    assert(r.getShort(1) == 9)
    assert(r.getDate(2).toString == "2000-01-01")
    assert(r.getShort(3) == 7) // out of UInt8 range -> default
    assert(r.getDecimal(4).longValueExact == 42L)
    assert(r.getDecimal(5).toString == "99999999999999999999")
    assert(r.getString(6) == "2024-03-15 07:08:09.125")
  }

  test("char() concatenates mod-256 bytes; alphaTokens splits alpha runs") {
    val r = one(
      """SELECT char(72, 105) AS hi, char(321) AS wrapped,
        |  alphaTokens('abc1def2ghi') AS toks,
        |  alphaTokens('1abc!') AS edge,
        |  hasTokenCaseInsensitive('Hello World', 'HELLO') AS ht,
        |  hasTokenCaseInsensitive('Hello World', 'ell') AS nope""".stripMargin)
    assert(r.getString(0) == "Hi")
    assert(r.getString(1) == "A") // 321 mod 256 = 65
    assert(r.getSeq[String](2) == Seq("abc", "def", "ghi"))
    assert(r.getSeq[String](3) == Seq("abc"))
    assert(r.getBoolean(4) && !r.getBoolean(5))
  }

  test("regexpQuoteMeta escapes metacharacters into a literal pattern") {
    val r = one(
      """SELECT regexpQuoteMeta('Hello.World(x)') AS q,
        |  match('Hello.World(x)', regexpQuoteMeta('Hello.World(x)')) AS self,
        |  match('HelloXWorld(x)', regexpQuoteMeta('Hello.World(x)')) AS not_dot,
        |  leftPadUTF8('abc', 7, '*') AS lp, rightPadUTF8('abc', 5, '.') AS rp""".stripMargin)
    assert(r.getString(0) == "Hello\\.World\\(x\\)")
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getString(3) == "****abc")
    assert(r.getString(4) == "abc..")
  }

  test("base64URLEncode is URL-safe and unpadded; decode round-trips") {
    val r = one(
      """SELECT base64URLEncode('https://example.com/a?b=c&d=~') AS e,
        |  base64URLDecode(base64URLEncode('https://example.com/a?b=c&d=~')) AS rt,
        |  base64URLEncode('ab') AS short""".stripMargin)
    val enc = r.getString(0)
    assert(!enc.contains("+") && !enc.contains("/") && !enc.endsWith("="))
    assert(r.getString(1) == "https://example.com/a?b=c&d=~")
    assert(r.getString(2) == "YWI") // 'ab' -> YWI= unpadded
  }

  test("encrypt/decrypt round-trip; tryDecrypt nulls on a wrong key") {
    val r = one(
      """SELECT decrypt('aes-256-cbc',
        |    encrypt('aes-256-cbc', 'secret', '32byteslongsecretkeyforaes256!!!'),
        |    '32byteslongsecretkeyforaes256!!!') AS rt,
        |  decrypt('aes-128-gcm',
        |    encrypt('aes-128-gcm', 'payload', 'sixteenbytes..ok'),
        |    'sixteenbytes..ok') AS gcm,
        |  tryDecrypt('aes-256-cbc',
        |    encrypt('aes-256-cbc', 'secret', '32byteslongsecretkeyforaes256!!!'),
        |    '32byteslongWRONGkeyforaes256!!!!') AS bad""".stripMargin)
    assert(r.getString(0) == "secret")
    assert(r.getString(1) == "payload")
    assert(r.isNullAt(2))
    val e = intercept[Exception](
      one("SELECT encrypt('des-ede3-cbc', 'x', 'k') AS no"))
    assert(e.getMessage.contains("aes"))
  }

  test("throwIf, currentSchemas, tupleToNameValuePairs") {
    val r = one(
      """SELECT throwIf(0) AS ok, throwIf(count(*) > 1e12, 'too big') AS agg,
        |  currentSchemas(true) AS cs,
        |  tupleToNameValuePairs(CAST((1, 2) AS STRUCT<a: INT, b: INT>)) AS nv
        |FROM orders""".stripMargin)
    assert(r.getInt(0) == 0)
    assert(r.getSeq[String](2) == Seq("default"))
    val nv = r.getSeq[org.apache.spark.sql.Row](3)
    assert(nv.map(x => (x.getString(0), x.getInt(1))) == Seq(("a", 1), ("b", 2)))
    val e = intercept[Exception](one("SELECT throwIf(1, 'boom') AS x"))
    assert(e.getMessage.contains("boom"))
  }
}
