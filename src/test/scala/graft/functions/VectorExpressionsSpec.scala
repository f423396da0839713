package graft.functions

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  private def one(sql: String) = {
    CHFunctions.register(spark)
    spark.sql(sql).collect().head
  }

  test("cosineSimilarity: identity, orthogonal, opposite, empty") {
    val r = one(
      """SELECT
        |  cosineSimilarity(array(1.0, 2.0), array(1.0, 2.0)),
        |  cosineSimilarity(array(1.0, 0.0), array(0.0, 1.0)),
        |  cosineSimilarity(array(1.0, 0.0), array(-1.0, 0.0)),
        |  cosineSimilarity(array(), array()),
        |  cosineSimilarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0))""".stripMargin)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
    assert(r.getDouble(3) == 0.0)
    assert(r.isNullAt(4))
  }

  test("cosTopK equals sort-and-take under random data and partitioning") {
    import spark.implicits._
    CHFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val k = 1 + rnd.nextInt(7)
      val n = 50 + rnd.nextInt(200)
      // duplicate scores force the id tie-break through merge paths
      val rows = (0 until n).map(i =>
        (i.toLong % 3, rnd.nextInt(20) / 10.0, rnd.nextLong().abs % 1000))
      val parts = 1 + rnd.nextInt(8) // partial/merge shape varies per trial
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(org.apache.spark.sql.functions.expr(
          s"cosTopK(struct(score, id), $k)").as("top"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1))))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._3, r._2))
          .sortBy { case (id, s) => (-s, id) }.take(k)
      }
      assert(got == want, s"trial $trial k=$k parts=$parts")
    }
  }

  test("srpBandKeys: deterministic, dim-sensitive, 6-bit range") {
    CHFunctions.register(spark)
    val r = one(
      """SELECT srpBandKeys(array(0.1, -0.5, 0.8, 0.2)),
        |  srpBandKeys(array(0.1, -0.5, 0.8, 0.2)),
        |  srpBandKeys(array(-0.1, 0.5, -0.8, -0.2))""".stripMargin)
    val a = r.getSeq[Int](0); val b = r.getSeq[Int](1); val c = r.getSeq[Int](2)
    assert(a == b) // same vector, same keys — planes are pure md5 arithmetic
    assert(a.length == SrpBandKeys.Bands)
    assert(a.forall(k => k >= 0 && k < (1 << SrpBandKeys.Bits)))
    // negated vector flips every sign bit: keys are the bitwise complement
    assert(a.zip(c).forall { case (x, y) => (x ^ y) == (1 << SrpBandKeys.Bits) - 1 })
  }

  test("cosineSimilarity casts float arrays implicitly") {
    val r = one(
      "SELECT cosineSimilarity(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), array(1.0, 2.0))")
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
  }

  test("simHash matches the portable SQL formulation") {
    val r = one(
      """SELECT simHash(array('spark', 'table', 'scan')),
        |  aggregate(
        |    zip_with(
        |      aggregate(transform(array('spark', 'table', 'scan'),
        |          t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)),
        |        array_repeat(0L, 60),
        |        (acc, h) -> zip_with(acc, sequence(0, 59),
        |          (a, i) -> a + (shiftright(h, i) % 2) * 2 - 1)),
        |      sequence(0, 59),
        |      (c, i) -> CASE WHEN c > 0 THEN shiftleft(1L, i) ELSE 0L END),
        |    0L, (a, x) -> a + x)""".stripMargin)
    assert(r.getLong(0) == r.getLong(1))
  }

  test("simHash is order-insensitive and empty-safe") {
    val r = one(
      """SELECT simHash(array('a', 'b')), simHash(array('b', 'a')),
        |  simHash(array())""".stripMargin)
    assert(r.getLong(0) == r.getLong(1)) // bag semantics
    assert(r.getLong(2) == 0L)
  }

  test("minHashSig: containment and determinism") {
    val r = one(
      """SELECT minHashSig(array('x y z', 'y z w')),
        |  minHashSig(array('x y z', 'y z w', 'q r s')),
        |  minHashSig(array())""".stripMargin)
    val s1 = r.getSeq[Long](0)
    val s2 = r.getSeq[Long](1)
    assert(s1.size == MinHashSig.NumHashes)
    // adding shingles can only lower each min
    s1.zip(s2).foreach { case (a, b) => assert(b <= a) }
    assert(r.getSeq[Long](2).forall(_ == 0L))
  }

  test("expressions survive both codegen and interpreted eval") {
    CHFunctions.register(spark)
    val df = spark.sql(
      "SELECT cosineSimilarity(array(1.0, 2.0, 3.0), array(3.0, 2.0, 1.0)) AS c")
    val expected = 10.0 / 14.0
    assert(math.abs(df.collect().head.getDouble(0) - expected) < 1e-12)
    // interpreted path (eval) via a non-codegen context: literal fold
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 2.0, 1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - expected) < 1e-12)
  }
}
