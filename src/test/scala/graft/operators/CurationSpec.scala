package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("seq_pack: greedy first-fit respects capacity, overlong doc gets own bin") {
    val out = Curation.seqPack(spark, sf).collect()
    assert(out.nonEmpty)
    // no bin of 2+ docs exceeds capacity (a single overlong doc may)
    out.foreach { r =>
      val (nDocs, binTokens) = (r.getLong(2), r.getLong(3))
      assert(nDocs == 1 || binTokens <= Curation.PackCapacity,
        s"multi-doc bin over capacity: $r")
    }
    // bins within a shard are dense from 0
    out.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0 && bins.last == bins.length - 1,
        s"shard $shard bins not dense: ${bins.toSeq}")
    }
    // every document is packed exactly once
    val total = out.map(_.getLong(2)).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("seq_pack is deterministic across runs and partitionings") {
    val a = Curation.seqPack(spark, sf).collect().toSeq
    val b = Curation.seqPack(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("text_repetition computes the duplicated-trigram ratio") {
    import spark.implicits._
    graft.functions.CHFunctions.register(spark)
    // the native TrigramStats expression against hand-computed cases
    val r = Seq((1L, "a b a b a b"), (2L, "x y z w"), (3L, "q r"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), expr("trigramStats(split(text, ' '))").as("st"))
      .select(col("doc_id"), col("st.n_trigrams"), col("st.n_distinct"))
      .orderBy("doc_id").collect()
    // "a b a b a b": trigrams [aba, bab, aba, bab] -> 4 total, 2 distinct
    assert(r(0).getLong(1) == 4 && r(0).getLong(2) == 2)
    // "x y z w": [xyz, yzw] all distinct
    assert(r(1).getLong(1) == 2 && r(1).getLong(2) == 2)
    // 2 tokens -> no trigrams
    assert(r(2).getLong(1) == 0 && r(2).getLong(2) == 0)
    // and over the real corpus the ratio is bounded
    val corpus = Curation.textRepetition(spark, sf).collect()
    assert(corpus.forall { row =>
      val d = row.getDouble(3); d >= 0.0 && d <= 1.0
    })
  }

  test("pii_scrub redacts planted emails, ips, phones and blocked terms") {
    import spark.implicits._
    // plant PII in a scratch documents table and run the REAL operator on it
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    val planted = "mail bob@example.com then 10.0.0.1 call +12345678 customer x"
    Seq((1L, planted, "en", "src0", planted.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Curation.piiScrub(spark, dir).head
    assert(r.getAs[Int]("n_email") == 1 && r.getAs[Int]("n_ip") == 1)
    assert(r.getAs[Int]("n_phone") == 1 && r.getAs[Int]("n_term") == 1)
    val expected = "mail <email> then <ip> call <phone> <term> x"
    assert(r.getAs[Int]("scrubbed_len") == expected.length)
    assert(r.getAs[String]("scrubbed_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // the shipped corpus: blocked terms fire, no synthetic emails exist
    val row = Curation.piiScrub(spark, sf).agg(sum("n_term"), sum("n_email")).head
    assert(row.getLong(0) > 0 && row.getLong(1) == 0L)
  }

  test("text_chunk covers every token with stride-aligned overlapping windows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Curation.textChunk(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == docs.keySet) // every doc chunked
    chunks.foreach { case (docId, rows) =>
      val n = docs(docId)
      val idxs = rows.map(_.getLong(1)).sorted
      assert(idxs.head == 0 && idxs.last == idxs.length - 1) // dense from 0
      rows.foreach { r =>
        val (ci, nToks) = (r.getLong(1), r.getLong(2))
        val start = ci * Curation.ChunkStride // 0-based
        assert(nToks == math.min(Curation.ChunkSize, n - start),
          s"doc $docId chunk $ci: $nToks tokens, doc has $n")
      }
      // the last chunk reaches the end of the document
      val lastStart = idxs.last * Curation.ChunkStride
      assert(lastStart + rows.map(_.getLong(2)).max >= n ||
        lastStart + Curation.ChunkSize >= n)
      // single chunk iff the doc fits one window
      assert((idxs.length == 1) == (n <= Curation.ChunkSize))
    }
  }

  test("text_surprisal: rarer vocabulary scores higher, ppl = exp(nll)") {
    val out = Curation.textSurprisal(spark, sf).collect()
    assert(out.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    out.foreach { r =>
      val (nll, ppl) = (r.getDouble(2), r.getDouble(3))
      assert(nll > 0, s"surprisal must be positive: $r")
      assert(math.abs(ppl - math.exp(nll)) <= 0.005 * math.exp(nll) + 0.01)
    }
    // a document made of the corpus' most common tokens must score lower
    // than one made of its rarest: check via token frequencies
    import spark.implicits._
    val tf = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    val docToks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val byNll = out.sortBy(_.getDouble(2))
    val commonDoc = byNll.head.getLong(0)
    val rareDoc = byNll.last.getLong(0)
    def meanFreq(id: Long) = {
      val ts = docToks(id); ts.map(tf(_).toDouble).sum / ts.size
    }
    assert(meanFreq(commonDoc) > meanFreq(rareDoc))
  }

  test("mix_sample hits each language's target rate and is reproducible") {
    val out = Curation.mixSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val targets = Curation.MixWeights.toMap
    out.foreach { case (lang, (n, k, rate)) =>
      val want = targets.getOrElse(lang, 1.0)
      assert(k <= n)
      // md5 uniformity: realized rate within ±0.1 of target on 100-ish docs
      assert(math.abs(rate - want) < 0.1, s"$lang: $rate vs $want")
    }
    val again = Curation.mixSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == again)
  }

  test("text_boilerplate masks planted repeated spans and nothing else") {
    import spark.implicits._
    val boiler = (1 to Curation.SpanLen).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      // the shared 8-token span is planted in docs 1 and 2 at different
      // offsets; the surrounding tokens are unique per doc
      (1L, s"u1 u2 $boiler u3 u4"),
      (2L, s"$boiler v1 v2 v3 v4 v5 v6 v7 v8"),
      // doc 3 shares nothing 8 tokens long with any other doc
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.textBoilerplate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // exactly the planted span masks in docs 1 and 2; doc 3 untouched
    assert(out(1L) == ((12L, 8L, md5hex("u1 u2 u3 u4"))))
    assert(out(2L) == ((16L, 8L,
      md5hex("v1 v2 v3 v4 v5 v6 v7 v8"))))
    assert(out(3L)._2 == 0L &&
      out(3L)._3 == md5hex("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
  }

  test("boilerplate df>=2 test: min!=max equals countDistinct>=2 on real spans") {
    // r21 rewrote both distinct-doc-frequency filters from
    // countDistinct(doc_id) >= 2 to min(doc_id) != max(doc_id); pin the
    // selected span-hash sets equal on the sf0.01 corpus (and that a
    // within-one-doc repeated span is NOT selected — doc 4 below).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.CHFunctions.register(spark)
    val boiler = (1 to Curation.SpanLen).map(i => s"b$i").mkString(" ")
    val extra = Seq(
      (4L, s"$boiler x1 x2 $boiler"), // repeats only WITHIN one doc
      (5L, s"$boiler y1"), (6L, s"y0 $boiler")).toDF("doc_id", "text")
    val real = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    val docs = real.unionByName(extra)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val spanH = docs.select(col("doc_id"),
      posexplode(expr(s"spanKeys(toks, ${Curation.SpanLen})"))
        .as(Seq("pos", "h")))
    val viaDistinct = spanH.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 2).select("h")
      .collect().map(_.getLong(0)).toSet
    val viaMinMax = spanH.groupBy("h")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
      .filter(col("d0") =!= col("d1")).select("h")
      .collect().map(_.getLong(0)).toSet
    assert(viaDistinct == viaMinMax)
    assert(viaMinMax.nonEmpty)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
