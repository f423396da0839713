package graft.functions

import graft.SparkSpec
import graft.sql.{QueryGuard, TableEnv}

/** Wave-34 value pins: the array first/last completion (OrNull
  * spellings, last-index with duplicates and multi-array zips), token
  * set predicates, and codepoint edit distance. */
class Wave34Spec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    TableEnv.register(spark, sf)
    QueryGuard.plan(spark, sql).collect().head
  }

  test("arrayFirst/arrayLast and OrNull spellings; no match is NULL") {
    val r = one(
      """SELECT arrayFirst(x -> x > 1, [1, 2, 3]) AS f,
        |  arrayFirstOrNull(x -> x > 9, [1, 2]) AS fn,
        |  arrayLast(x -> x > 1, [1, 2, 3]) AS l,
        |  arrayLastOrNull(x -> x > 9, [1]) AS ln""".stripMargin)
    assert(r.getInt(0) == 2 && r.isNullAt(1))
    assert(r.getInt(2) == 3 && r.isNullAt(3))
  }

  test("arrayLastIndex: duplicates, multi-array zip, and the 0 no-match") {
    val r = one(
      """SELECT arrayLastIndex(x -> x = 2, [2, 1, 2, 3]) AS dup,
        |  arrayLastIndex(x -> x > 9, [1, 2]) AS none,
        |  arrayLastIndex((x, y) -> x = y, [1, 2, 3], [1, 5, 3]) AS zip""".stripMargin)
    assert(r.getInt(0) == 3 && r.getInt(1) == 0 && r.getInt(2) == 3)
  }

  test("hasAnyTokens/hasAllTokens over the tokenizer; UTF8 edit distance") {
    val r = one(
      """SELECT hasAnyTokens('Hello World foo', ['foo', 'zap']) AS ha,
        |  hasAllTokens('Hello World foo', ['foo', 'zap']) AS hall,
        |  hasAllTokens('Hello World foo', ['hello', 'foo']) AS nocase,
        |  editDistanceUTF8('café', 'cafe') AS ed,
        |  editDistanceUTF8('kitten', 'sitting') AS ks,
        |  indexOfAssumeSorted([1, 3, 5, 7], 5) AS ias""".stripMargin)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    // tokens are case-preserving like CH's default tokenizer
    assert(!r.getBoolean(2))
    assert(r.getInt(3) == 1) // codepoint-based, not byte-based
    assert(r.getInt(4) == 3)
    assert(r.getLong(5) == 3L)
  }

  test("multiFuzzyMatchAny rejects with composable guidance") {
    val e = intercept[Exception](
      one("SELECT multiFuzzyMatchAny('abc', 1, ['xyz']) AS x"))
    assert(e.getMessage.contains("editDistance"))
  }
}
