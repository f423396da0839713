package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  /** Hand-computed fixture: run the text pipeline on known docs. */
  private lazy val tmp: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_text").toString
    Seq(
      (1L, "the cat sat on the mat", "en", "s", 22L),
      (2L, "a b", "en", "s", 3L),
      (3L, "Hello, world! Hello.", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("token counts: whitespace vs regex stream") {
    val m = TextOps.textTokens(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2).toInt)).toMap
    assert(m(1L) == ((6, 6)))
    assert(m(2L) == ((2, 2)))
    // "Hello, world! Hello." -> words Hello world Hello + , ! .
    assert(m(3L) == ((3, 6)))
  }

  test("quality ratios are exact on the fixture") {
    val r = TextOps.textQuality(spark, tmp).collect()
      .find(_.getLong(0) == 1L).get
    assert(r.getInt(2) == 6) // n_tokens
    assert(r.getDouble(5) == math.rint(2.0 / 6 * 1e6) / 1e6) // 'the' twice
    assert(r.getDouble(6) == math.rint(5.0 / 6 * 1e6) / 1e6) // distinct ratio
  }

  test("language id picks the stopword-profile argmax deterministically") {
    val rows = TextOps.textLangId(spark, tmp).collect()
    val pred = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pred(1L) == "en")
    assert(pred(2L) == "en") // 'a' is an en marker
    assert(pred(3L) == "unknown") // no markers
  }

  test("fingerprints: identical normalized text collides, order matters") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fp").toString
    Seq(
      (1L, "Alpha  Beta", "en", "s", 1L),
      (2L, "alpha beta", "en", "s", 1L), // same after normalization
      (3L, "beta alpha", "en", "s", 1L)) // same tokens, different order
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = TextOps.textFingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L)._1 != fp(3L)._1)
    assert(fp(1L)._2 != fp(3L)._2)
  }

  test("split assignment is deterministic and roughly 80/10/10") {
    val a = TextOps.textSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TextOps.textSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // rerun-stable: pure hash of doc_id, no rand()
    val total = a.values.sum.toDouble
    assert(a("train") / total > 0.7 && a("train") / total < 0.9)
    assert(a.keySet == Set("train", "valid", "test"))
  }

  test("decontamination flags a planted benchmark 8-gram only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_decon").toString
    val gram8 = "a b c d e f g h"
    Seq(
      (5L, s"benchmark doc with $gram8 inside", "en", "s", 1L),
      (30L, s"training doc leaking $gram8 verbatim", "en", "s", 1L),
      (31L, "clean training doc with nothing shared at all", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val flagged = TextOps.textDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(30L) && flagged(30L) >= 1)
    assert(!flagged.contains(31L))
  }

  test("tfidf ranks a distinctive token above corpus-wide ones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tfidf").toString
    Seq(
      (1L, "common common zebra", "en", "s", 1L),
      (2L, "common plain words", "en", "s", 1L),
      (3L, "common plain other", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.textTfidf(spark, dir).collect()
    val doc1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getInt(3))
    // 'zebra' (df=1) must outrank 'common' (df=3, idf=0) despite tf=2
    assert(doc1.head.getString(1) == "zebra")
    assert(doc1.map(_.getDouble(2)).sliding(2).forall(p => p.head >= p.last))
    rows.groupBy(_.getLong(0)).values.foreach(g => assert(g.length <= 3))
  }
}
