package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: token counting, quality scoring, language ID and
  * content fingerprinting (SURVEY §2 D8-D11).
  *
  * All are narrow per-row transformations built from codegen'd Spark
  * natives (split / regexp / higher-order functions) — no UDFs, no
  * shuffles except the final deterministic ORDER BY, so they scan at
  * parquet-read speed and scale linearly with the corpus.
  *
  * Every computed ratio is rounded so the DuckDB oracle (same rule in
  * DuckDB dialect) matches exactly.
  */
object TextOps {

  private val toks = split(col("text"), " ")

  /** D10: whitespace tokens + a BPE-ish regex token stream (letter runs,
    * digit runs, single punctuation marks — the pre-tokenizer shape GPT-2
    * style BPEs use). Counting is a native one-pass matcher loop
    * ([[graft.functions.CountMatches]]) — no per-token array
    * materialization, which measured as a 3× regression at sf0.1. */
  val textTokens: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).as("ws_tokens"),
        expr("countMatches(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')")
          .as("bpe_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")
  }

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** D9: quality scoring — length, mean token length, punctuation /
    * stopword / distinct-token ratios, and a blended quality score. */
  val textQuality: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val nTok = size(toks).cast("double")
    // native one-pass stopword counting (r20) — see textLangId
    val stopHits =
      expr(s"tokenSetCount(split(text, ' '), '${stopwords.mkString(",")}')")
    val punct = expr("countMatches(text, '[^a-zA-Z0-9 ]')")
    val distinctRatio = size(array_distinct(toks)) / nTok
    val stopRatio = stopHits / nTok
    val punctRatio = punct / length(col("text")).cast("double")
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(toks).as("n_tokens"),
        round((length(col("text")) - size(toks) + 1) / nTok, 4).as("avg_token_len"),
        round(punctRatio, 6).as("punct_ratio"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(distinctRatio, 6).as("distinct_ratio"),
        round(
          least(length(col("text")).cast("double") / 200.0, lit(1.0)) * 0.4
            + distinctRatio * 0.4
            + least(stopRatio * 5.0, lit(1.0)) * 0.2, 6).as("quality"))
      .orderBy("doc_id")
  }

  /** Stopword profiles for the lang-ID heuristic. Scores are hit counts
    * of language-marker tokens; CJK characters trump everything. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "une"),
    "es" -> Seq("el", "los", "una", "y", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** D8: language ID — CJK char detection + stopword-profile argmax with
    * fixed tie-break order (en > fr > es > de > unknown). Deterministic,
    * so the identical rule in DuckDB is an exact oracle. */
  val textLangId: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    // native one-pass marker counting (r20): the filter+isin HOF ran an
    // interpreted lambda per token per language (4 passes/row); the
    // codegen'd tokenSetCount is one hash-set probe per token
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> expr(s"tokenSetCount(split(text, ' '), '${ms.mkString(",")}')")
    }
    val Seq(en, fr, es, de) = scores.map(_._2)
    // existence test only (r20): rlike stops at the first CJK hit;
    // size(regexp_extract_all(...)) > 0 materialized an array of every
    // match per row just to compare its length with zero
    val hasCjk = col("text").rlike("[\\u4e00-\\u9fff]")
    val best = greatest(en, fr, es, de)
    Tables(s, dir, "documents")
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        when(hasCjk, "zh")
          .when(best === 0, "unknown")
          .when(en === best, "en")
          .when(fr === best, "fr")
          .when(es === best, "es")
          .otherwise("de").as("pred_lang"),
        en.as("en_score"), fr.as("fr_score"), es.as("es_score"), de.as("de_score"))
      .orderBy("doc_id")
  }

  /** D11: document fingerprints — md5 of whitespace-normalized text plus
    * an order-sensitive rolling hash (md5 chain over tokens; an empty
    * seed keeps it well-defined for 1-token docs). */
  val textFingerprint: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    // collapseSpaces/spaceSplit (r21): byte-exact regex-free twins of
    // the regexp_replace/split normalization, like the dedup family
    val norm = call_function("collapseSpaces", trim(lower(col("text"))))
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(norm).as("content_md5"),
        // native md5-chain fold (r20): the aggregate() HOF ran an
        // interpreted lambda per token, round-tripping the running hex
        // through UTF8String concat and the md5 expression each step
        expr("rollingMd5(spaceSplit(collapseSpaces(trim(lower(text)))))")
          .as("rolling_fp"))
      .orderBy("doc_id")
  }

  /** D15: TF-IDF keyword extraction — top-3 terms per document by
    * `tf × ln(N/df)` (ties to the lexicographically first token).
    * Scale shape: one explode feeding two partial-agg groupBys; the
    * 1-row corpus count joins in as a broadcast; the per-doc rank
    * window parallelizes over millions of SMALL doc groups (group size
    * = distinct tokens per doc, bounded by document length — unlike a
    * per-query ANN window there is no hot reducer). */
  val textTfidf: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    // tf is the only corpus-wide pass (r20, guide §2.3/§2.4): df is a
    // row-count per token OVER tf — the old `toks.distinct().groupBy`
    // re-exploded the corpus and paid a full (doc_id, token) distinct
    // shuffle for numbers tf already holds. One localCheckpoint lets
    // the scoring join and the df aggregate share the single pass; the
    // df table is vocabulary-sized (sublinear in corpus, same contract
    // as textSurprisal's tf broadcast), so it broadcasts back.
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct("doc_id").as("n"))
    tf.join(broadcast(dfreq), "token")
      .join(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("tfidf"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  /** D16: deterministic train/valid/test split — the data-mixing step
    * of corpus prep. The bucket is pure md5 arithmetic on the doc id
    * (NOT Spark's `rand()`), so the same document lands in the same
    * split on any engine, any run, any partitioning — reshuffling or
    * re-reading the corpus can never leak validation docs into train.
    * Narrow per-row expression; one aggregation for the report. */
  val textSplit: Q = (s, dir) => {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 100)
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
          .as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("split")
  }

  /** D17: benchmark decontamination — flag corpus documents sharing any
    * 8-gram with an evaluation set (stood in here by doc_id < 20), the
    * standard guard against test-set leakage into training data.
    * Scale shape: the benchmark side is SMALL by definition, so its
    * distinct shingle set broadcasts and the corpus-side check is a
    * map-side hash join — the corpus is never shuffled. */
  val textDecontaminate: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val docs = Tables(s, dir, "documents")
    // native 8-gram shingler (r20) — see Dedup.withShingles
    def shingles(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        explode(expr("wordShingles(split(text, ' '), 8)")).as("shingle"))
    val bench = shingles(docs.filter(col("doc_id") < 20))
      .select("shingle").distinct()
    shingles(docs.filter(col("doc_id") >= 20))
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct("shingle").as("n_shared"))
      .orderBy("doc_id")
  }

  /** D28: character-entropy quality signal — Shannon entropy of each
    * document's character distribution through the native one-pass
    * [[graft.functions.CharEntropy]] (narrow, scan-speed; no shuffle).
    * Random noise sits high, repeated-char spam low, natural text
    * mid-band — the CCNet-adjacent cheap filter before model-based
    * scoring. Banding uses the ROUNDED value so both engines bucket
    * identically at the thresholds. */
  val textEntropy: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val ent = round(expr("charEntropy(text)"), 6)
    Tables(s, dir, "documents")
      .select(col("doc_id"), ent.as("char_ent"),
        when(ent < 3.5, "low").when(ent < 4.5, "mid").otherwise("high")
          .as("band"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangId,
    "text_fingerprint" -> textFingerprint,
    "text_tfidf" -> textTfidf,
    "text_split" -> textSplit,
    "text_entropy" -> textEntropy,
    "text_decontaminate" -> textDecontaminate)

  val oracles: Map[String, String] = Map(
    "text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, substring(text, i.i, 1) AS c
        |  FROM documents, unnest(generate_series(1, length(text))) AS i(i)),
        |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS c_n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c_n) AS n FROM cnt GROUP BY 1),
        |e AS (
        |  SELECT cnt.doc_id, round(-sum((c_n / n) * log2(c_n / n)), 6) AS char_ent
        |  FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id GROUP BY cnt.doc_id)
        |SELECT doc_id, char_ent,
        |  CASE WHEN char_ent < 3.5 THEN 'low'
        |       WHEN char_ent < 4.5 THEN 'mid' ELSE 'high' END AS band
        |FROM e ORDER BY doc_id""".stripMargin,
    "text_split" ->
      """WITH b AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(toks) - 7, 1)),
        |                          i -> array_to_string(toks[i:i+7], ' '))) AS shingle
        |  FROM t),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20)
        |SELECT s.doc_id, count(DISTINCT s.shingle) AS n_shared
        |FROM sh s JOIN bench USING (shingle)
        |WHERE s.doc_id >= 20
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, token,
        |    round(tf * ln(n.n / CAST(df AS DOUBLE)), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, token, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, token) AS rn
        |  FROM scored)
        |SELECT doc_id, token, tfidf, CAST(rn AS INT) AS rn FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_tokens,
        |  CAST(length(text) AS INT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  round((length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE), 4) AS avg_token_len,
        |  round(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
        |  round(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
        |  round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6) AS distinct_ratio,
        |  round(least(length(text) / 200.0, 1.0) * 0.4
        |    + len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) * 0.4
        |    + least(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) / CAST(len(toks) AS DOUBLE) * 5.0, 1.0) * 0.2, 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks,
        |    len(regexp_extract_all(text, '[一-鿿]')) AS cjk FROM documents),
        |s AS (SELECT doc_id, lang, cjk,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS en_score,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','une'))) AS fr_score,
        |    len(list_filter(toks, t -> t IN ('el','los','una','y','es'))) AS es_score,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS de_score
        |  FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN cjk > 0 THEN 'zh'
        |       WHEN greatest(en_score, fr_score, es_score, de_score) = 0 THEN 'unknown'
        |       WHEN en_score = greatest(en_score, fr_score, es_score, de_score) THEN 'en'
        |       WHEN fr_score = greatest(en_score, fr_score, es_score, de_score) THEN 'fr'
        |       WHEN es_score = greatest(en_score, fr_score, es_score, de_score) THEN 'es'
        |       ELSE 'de' END AS pred_lang,
        |  CAST(en_score AS INT) AS en_score, CAST(fr_score AS INT) AS fr_score,
        |  CAST(es_score AS INT) AS es_score, CAST(de_score AS INT) AS de_score
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm FROM documents)
        |SELECT doc_id, md5(norm) AS content_md5,
        |  list_reduce(list_prepend('', string_split(norm, ' ')),
        |              (h, t) -> md5(h || t)) AS rolling_fp
        |FROM t ORDER BY doc_id""".stripMargin)
}
