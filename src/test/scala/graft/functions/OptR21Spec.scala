package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r21 native-rewrite equivalence pins: every rewrite below replaced an
  * exact formulation and must keep byte-identical results on the edge
  * cases that formulation defined. */
class OptR21Spec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Row] = {
    graft.functions.CHFunctions.register(spark)
    cases.select(c.as("v")).collect().toSeq
  }

  private lazy val cases = {
    import spark.implicits._
    Seq(
      "a b c",
      "a  b   c",
      "  lead and  trail  ",
      "",
      " ",
      "   ",
      "one",
      "tab\there  kept",
      "nl\nhere  kept",
      "unicode  ümlaut  漢字  ok",
      "a b  c" // NBSP is not 0x20: must not collapse
    ).toDF("text")
  }

  test("collapseSpaces == regexp_replace(s, ' +', ' ') on edge cases") {
    graft.functions.CHFunctions.register(spark)
    val got = one(call_function("collapseSpaces", col("text")))
    val want = one(regexp_replace(col("text"), " +", " "))
    assert(got == want)
  }

  test("spaceSplit == split(s, ' ') incl. empties kept") {
    graft.functions.CHFunctions.register(spark)
    // split on the UNCOLLAPSED text so double spaces produce empty
    // tokens — the builtin keeps them (limit -1) and so must we
    val got = one(call_function("spaceSplit", col("text")))
    val want = one(split(col("text"), " "))
    assert(got == want)
  }

  test("normalization pipeline end-to-end equals the regex formulation") {
    graft.functions.CHFunctions.register(spark)
    val native = one(call_function("spaceSplit",
      call_function("collapseSpaces", trim(lower(col("text"))))))
    val regex = one(split(
      regexp_replace(trim(lower(col("text"))), " +", " "), " "))
    assert(native == regex)
  }

  test("wordShingles byte-level concat keeps the r20 string semantics") {
    import spark.implicits._
    graft.functions.CHFunctions.register(spark)
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("a"),
      Seq.empty[String],
      Seq("ü", "漢字", "x")).toDF("toks")
    val got = df.select(expr("wordShingles(toks, 3)").as("v")).collect().toSeq
    val want = df.select(expr(
      """transform(sequence(1, greatest(size(toks) - 2, 1)),
        |  i -> concat_ws(' ', slice(toks, i, 3)))""".stripMargin).as("v"))
      .collect().toSeq
    assert(got.toString == want.toString)
  }

  test("band pair keys give the same buckets as the md5 construction") {
    // two docs collide in band j under the old md5(concat(h_2j, h_2j+1))
    // key iff they collide under the raw (h_2j, h_2j+1) pair
    import spark.implicits._
    graft.functions.CHFunctions.register(spark)
    val docs = graft.Tables(spark, sf, "documents")
    val sig = docs
      .withColumn("toks", call_function("spaceSplit",
        call_function("collapseSpaces", trim(lower(col("text"))))))
      .withColumn("sig", expr("minHashSig(wordShingles(toks, 3))"))
      .select(col("doc_id"), col("sig"))
    def pairs(bands: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
      bands.as("a").join(bands.as("b"),
          keys.map(k => col(s"a.$k") === col(s"b.$k"))
            .reduce(_ && _) && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaMd5 = pairs(
      sig.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 5), j -> named_struct(
          |  'band', j,
          |  'bkey', md5(concat(cast(sig[j * 2] as string),
          |              cast(sig[j * 2 + 1] as string)))))""".stripMargin))
        .as("b")).select(col("doc_id"), col("b.band").as("band"),
          col("b.bkey").as("bkey")), Seq("band", "bkey"))
    val viaPair = pairs(
      sig.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 5), j -> named_struct(
          |  'band', j, 'ka', sig[j * 2], 'kb', sig[j * 2 + 1]))"""
          .stripMargin)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"),
          col("b.ka").as("ka"), col("b.kb").as("kb")),
      Seq("band", "ka", "kb"))
    assert(viaMd5 == viaPair)
    assert(viaPair.nonEmpty)
  }
}
