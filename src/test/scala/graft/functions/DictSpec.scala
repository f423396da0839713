package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DictSpec extends SparkSpec {

  test("dictGet looks up registered attributes; misses and null keys are null") {
    import spark.implicits._
    CHFunctions.register(spark)
    Dict.register("color_d",
      Seq((1L, "red", 10), (2L, "blue", 20)).toDF("k", "name", "weight"),
      "k", Seq("name", "weight"))
    val out = Seq(Some(1L), Some(2L), Some(99L), None).toDF("k")
      .select(
        expr("dictGet('color_d', 'name', k)").as("name"),
        expr("dictGet('color_d', 'weight', k)").as("w"))
      .collect()
    assert(out(0).getString(0) == "red" && out(0).getInt(1) == 10)
    assert(out(1).getString(0) == "blue" && out(1).getInt(1) == 20)
    assert(out(2).isNullAt(0) && out(2).isNullAt(1)) // missing key
    assert(out(3).isNullAt(0) && out(3).isNullAt(1)) // null key
  }

  test("dictGetOrDefault falls back on misses; dictHas reports presence") {
    import spark.implicits._
    CHFunctions.register(spark)
    Dict.register("fallback_d",
      Seq((1L, "one")).toDF("k", "v"), "k", Seq("v"))
    val out = Seq(1L, 42L).toDF("k")
      .select(
        expr("dictGetOrDefault('fallback_d', 'v', k, 'unknown')").as("v"),
        expr("dictHas('fallback_d', 'v', k)").as("present"))
      .collect()
    assert(out(0).getString(0) == "one" && out(0).getBoolean(1))
    assert(out(1).getString(0) == "unknown" && !out(1).getBoolean(1))
  }

  test("typed dictGet* spellings cast to the named type; OrDefault twins fall back") {
    import spark.implicits._
    CHFunctions.register(spark)
    Dict.register("typed_d",
      Seq((1L, "42", 7L)).toDF("k", "txt", "num"), "k", Seq("txt", "num"))
    val r = Seq(1L).toDF("k").select(
      expr("dictGetString('typed_d', 'txt', k)").as("s"),
      expr("dictGetInt32('typed_d', 'txt', k)").as("i32"),
      expr("dictGetInt64('typed_d', 'num', k)").as("i64"),
      expr("dictGetUInt8('typed_d', 'num', k)").as("u8"),
      expr("dictGetFloat64('typed_d', 'txt', k)").as("f64"),
      expr("dictGetInt32OrDefault('typed_d', 'txt', k + 10, -5)").as("dmiss"),
      expr("dictGetStringOrDefault('typed_d', 'txt', k, 'zz')").as("dhit"),
      expr("toTypeName(dictGetInt32('typed_d', 'txt', k))").as("tn")).head
    assert(r.getString(0) == "42")
    assert(r.getInt(1) == 42)
    assert(r.getLong(2) == 7L)
    assert(r.getShort(3) == 7) // UInt8 rides the next signed width
    assert(r.getDouble(4) == 42.0)
    assert(r.getInt(5) == -5)
    assert(r.getString(6) == "42")
    assert(r.getString(7) == "Int32")
  }

  test("dictGetOrNull / dictGetDate / dictGetDateTime resolve") {
    import spark.implicits._
    CHFunctions.register(spark)
    Dict.register("when_d",
      Seq((1L, "2024-03-05", "2024-03-05 07:08:09"))
        .toDF("k", "d", "ts"), "k", Seq("d", "ts"))
    val r = Seq(1L, 9L).toDF("k").select(
      expr("dictGetOrNull('when_d', 'd', k)").as("dn"),
      expr("toString(dictGetDate('when_d', 'd', k))").as("d"),
      expr("toString(dictGetDateTime('when_d', 'ts', k))").as("ts"))
      .collect()
    assert(r(0).getString(1) == "2024-03-05")
    assert(r(0).getString(2) == "2024-03-05 07:08:09")
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("integer-width keys normalize: INT column probes a BIGINT-keyed dict") {
    import spark.implicits._
    CHFunctions.register(spark)
    Dict.register("norm_d", Seq((5L, "five")).toDF("k", "v"), "k", Seq("v"))
    val r = Seq(5).toDF("k") // int, not long
      .select(expr("dictGet('norm_d', 'v', k)")).head
    assert(r.getString(0) == "five")
  }

  test("unknown dictionary fails analysis loudly") {
    CHFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT dictGet('nope_d', 'x', 1)").collect()
    }
    assert(e.getMessage.contains("unknown dictionary")
      || Option(e.getCause).exists(_.getMessage.contains("unknown dictionary")))
  }

  test("oversized dictionaries are rejected at registration") {
    val big = spark.range(Dict.MaxRows + 1)
      .select(col("id").as("k"), col("id").cast("string").as("v"))
    val e = intercept[IllegalArgumentException] {
      Dict.register("big_d", big, "k", Seq("v"))
    }
    assert(e.getMessage.contains("broadcast join"))
  }
}
