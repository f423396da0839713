package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CH integer arithmetic is unchecked/wrapping (reference: any CH
  * SELECT through mcp_server.py:433; CH documents modular integer
  * arithmetic) — [[WrapArith]] flips integral ANSI ops to LEGACY
  * wrap. These tests drive every rewritten shape with DATA-DRIVEN
  * operands (range(), not VALUES: literal-only subtrees constant-fold
  * in an earlier optimizer batch, the documented hole) at the exact
  * key magnitudes (≥1e9 offsets) where the sf1 scale bench died in
  * round 10. */
class WrapArithSpec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    spark.sql(sql).collect().head
  }

  test("multiply() and bare * wrap on long overflow (Knuth-hash idiom)") {
    val k = 5000000000L
    val expect = k * 2654435761L // JVM two's-complement wrap
    assert(expect < 0) // the case that threw ARITHMETIC_OVERFLOW
    val r = one(
      s"""SELECT multiply(id + $k, 2654435761) AS f,
         |  (id + $k) * 2654435761 AS op
         |FROM range(1)""".stripMargin)
    assert(r.getLong(0) == expect && r.getLong(1) == expect)
  }

  test("modulo-of-wrapped-multiply (the q_ch_bits shape) plans and runs") {
    val r = one(
      s"""SELECT modulo(multiply(id + 5000000000, 2654435761), 4294967296) AS ip,
         |  pmod((id + 5000000000) * 2654435761, 4294967296) AS ipp
         |FROM range(1)""".stripMargin)
    assert(math.abs(r.getLong(0)) < 4294967296L)
    assert(r.getLong(1) >= 0 && r.getLong(1) < 4294967296L)
  }

  test("plus / minus / negate / abs wrap at the Long boundary") {
    // operands come through aggregates: a bare `lit + id + lit` gets
    // regrouped by ReorderAssociativeOperator and the literal pair
    // constant-folds (throwing) before the last-batch WrapArith runs —
    // part of the documented literal-only hole; data-driven operands
    // (the class that matters at scale) never fold
    val r = one(
      """SELECT plus(max(x), 1) AS p,
        |  minus(min(y), 1) AS m,
        |  negate(min(y)) AS n,
        |  abs(min(y)) AS a
        |FROM (SELECT id, 9223372036854775807 AS x,
        |        -9223372036854775807 - 1 AS y FROM range(1))""".stripMargin)
    assert(r.getLong(0) == Long.MinValue)
    assert(r.getLong(1) == Long.MaxValue)
    assert(r.getLong(2) == Long.MinValue) // CH: negate(Int64.min) wraps to itself
    assert(r.getLong(3) == Long.MinValue)
  }

  test("sum over Int64 wraps like CH's unchecked accumulator") {
    val r = one(
      "SELECT sum(9223372036854775807 - id) AS s FROM range(2)")
    assert(r.getLong(0) == Long.MaxValue + (Long.MaxValue - 1L)) // wraps negative
  }

  test("toInt8/16/32 wrap on numeric narrowing like CH truncation") {
    val r = one(
      """SELECT toInt32(4294967296 + id) AS a, toInt32(4294967297 + id) AS b,
        |  toInt8(200 + id) AS c, toInt16(65541 + id) AS d,
        |  toInt32(-4294967295 + id) AS e
        |FROM range(1)""".stripMargin)
    assert(r.getInt(0) == 0 && r.getInt(1) == 1)
    assert(r.getByte(2) == -56 && r.getShort(3) == 5)
    assert(r.getInt(4) == 1)
    // throw-on-garbage-string contract survives the wrap plumbing
    intercept[Exception] { one("SELECT toInt32('nope' || cast(id AS STRING)) FROM range(1)") }
  }

  test("bit shifts at or past the 64-bit width yield 0 like ClickHouse") {
    // Java/Spark mask the shift amount mod 64 (x << 64 == x); CH
    // yields 0 once the amount reaches the arithmetic width
    val r = one(
      """SELECT bitShiftLeft(1 + id, 64) AS a, bitShiftLeft(1 + id, 65) AS b,
        |  bitShiftRight(100 + id, 64) AS c, bitShiftLeft(5 + id, -1) AS d,
        |  bitShiftLeft(1 + id, 62) AS e
        |FROM range(1)""".stripMargin)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getLong(3) == 0L && r.getLong(4) == (1L << 62))
  }

  test("all-literal overflow wraps through QueryGuard.plan (hole closed)") {
    // ConstantFolding / ConvertToLocalRelation run in optimizer
    // batches ahead of extraOptimizations, so these shapes used to
    // throw ANSI overflow before WrapArith ever ran — QueryGuard.plan
    // now rewrites the ANALYZED plan, so the fold itself wraps
    CHFunctions.register(spark)
    import graft.sql.QueryGuard
    // pure literal fold
    val a = QueryGuard.plan(spark,
      "SELECT 9223372036854775807 + 1 AS w").collect().head
    assert(a.getLong(0) == Long.MinValue)
    // ReorderAssociativeOperator regroups lit+col+lit and folds the
    // literal pair — the exact regrouping that dodged the old rule
    val b = QueryGuard.plan(spark,
      """SELECT 9223372036854775807 + id + 9223372036854775807 AS w
        |FROM range(1)""".stripMargin).collect().head
    assert(b.getLong(0) == -2L)
    // VALUES rows: ConvertToLocalRelation evaluates the projection
    val c = QueryGuard.plan(spark,
      "SELECT x * 2654435761 AS w FROM VALUES (5000000000) AS t(x)")
      .collect().head
    assert(c.getLong(0) == 5000000000L * 2654435761L)
    // decimal literals still fold ANSI-checked (CH Decimal throws too)
    intercept[Exception] {
      QueryGuard.plan(spark,
        """SELECT CAST(10000000000000000000 AS DECIMAL(38,0))
          |     * CAST(10000000000000000000 AS DECIMAL(38,0))""".stripMargin)
        .collect()
    }
  }

  test("IEEE divide honors the DIVISOR's zero sign and zips to ±inf/NaN") {
    // data-driven: id = 0 → +0.0 and -0.0 divisors; numerators ±1, 0.
    // D-suffixed literals: bare 1.0 is a DECIMAL literal in Spark SQL
    // (decimal division keeps ANSI's throw BY DESIGN — the served
    // path's float-literal shim is what makes pasted 1.0 a Float64)
    val r = one(
      """SELECT (id + 1.0D) / (id * 1.0D) AS pos_div_pz,
        |  (id + 1.0D) / (id * -1.0D) AS pos_div_nz,
        |  (-1.0D - id) / (id * -1.0D) AS neg_div_nz,
        |  (id * 1.0D) / (id * 1.0D) AS zero_div_zero,
        |  divide(id + 1.0D, id * -1.0D) AS named_nz
        |FROM range(1)""".stripMargin)
    assert(r.getDouble(0).isPosInfinity)
    assert(r.getDouble(1).isNegInfinity) // 1 / -0.0 = -inf (ADVICE r11)
    assert(r.getDouble(2).isPosInfinity) // -1 / -0.0 = +inf
    assert(r.getDouble(3).isNaN)
    assert(r.getDouble(4).isNegInfinity) // named divide() agrees
  }

  test("decimal arithmetic keeps ANSI checked overflow (CH Decimal throws too)") {
    intercept[Exception] {
      one(
        """SELECT CAST(10000000000000000000 + id AS DECIMAL(38,0))
          |     * CAST(10000000000000000000 + id AS DECIMAL(38,0))
          |FROM range(1)""".stripMargin)
    }
  }

  test("q_ch_bits and q_ch_ip run end-to-end at sf1-scale key offsets") {
    // replicate the ScaleData key regime: every key carries a +1e9
    // offset, the exact magnitudes where round 10's scale bench threw
    // ARITHMETIC_OVERFLOW. A fresh session keeps the offset temp
    // views (TableEnv.register is idempotent per (session, dir)) from
    // leaking into suites that registered the same dirs already.
    val dir = java.nio.file.Files.createTempDirectory("graft_wrap_sf").toString
    val s2 = spark.newSession()
    val off = 1000000000L
    val keyed = Map(
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "supplier" -> Seq("s_suppkey"), "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"),
      "region" -> Nil, "nation" -> Nil)
    keyed.foreach { case (t, keys) =>
      var df = s2.read.parquet(s"$sf/$t.parquet")
      keys.foreach(k => df = df.withColumn(k, col(k) + lit(off)))
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val bits = graft.SparkEntry.queries("q_ch_bits")(s2, dir).collect()
    assert(bits.length == 1 && bits.head.getLong(0) > 0)
    val ip = graft.SparkEntry.queries("q_ch_ip")(s2, dir).collect()
    assert(ip.length == 5)
  }
}
