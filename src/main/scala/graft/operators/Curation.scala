package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Corpus-curation operators for LLM training-data pipelines (SURVEY §2
  * D18-D21): sequence packing, repetition scoring, PII scrubbing and
  * weighted data mixing over the `documents` table.
  *
  * All randomness-free: sharding and sampling decisions are md5
  * arithmetic on the doc id (like [[TextOps.textSplit]]), so the same
  * document gets the same decision on any engine, any run, any
  * partitioning — and the DuckDB oracle can replay the identical rule.
  */
object Curation {

  /** Tokens-per-context-window for [[seqPack]]. */
  val PackCapacity = 512

  /** Shard count for [[seqPack]]. 8 here; at corpus scale this is the
    * write-parallelism knob (thousands), and shards stay independent. */
  val PackShards = 8

  private def md5Mod(prefix: String, mod: Int) =
    conv(substring(md5(concat(lit(prefix), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long") % mod

  /** D18: sequence packing — the batch-prep step that concatenates
    * documents into fixed-size context windows. Greedy first-fit in
    * deterministic order: shard by md5(doc_id), order by doc_id within
    * the shard, open a new bin when the next doc would overflow
    * (overlong docs get a bin of their own). Packing is inherently
    * sequential-per-shard (bin state resets on overflow), which no
    * window function expresses — so shards ARE the parallelism:
    * repartition on shard, sort within partitions, one imperative pass
    * per partition (the justified `mapPartitions` case), then a
    * partial-agg rollup per bin. The oracle replays the same greedy
    * rule with a recursive CTE. */
  val seqPack: Q = (s, dir) => {
    import s.implicits._
    val cap = PackCapacity // local copy: the closure must not drag the object in
    val docs = Tables(s, dir, "documents")
      .select(md5Mod("", PackShards).as("shard"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = docs
      .repartition(PackShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var shard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (sh, docId, n) =>
          if (sh != shard) { shard = sh; bin = 0L; fill = 0L }
          if (fill > 0 && fill + n > cap) { bin += 1; fill = 0L }
          fill += n
          (sh, bin, docId, n)
        }
      }
      .toDF("shard", "bin_idx", "doc_id", "n_tokens")
    packed.groupBy("shard", "bin_idx")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("shard", "bin_idx")
  }

  /** D19: repetition scoring — the duplicated-trigram ratio, the
    * standard boilerplate/spam signal quality filters cut on. The
    * trigram walk runs as the native codegen'd
    * [[graft.functions.TrigramStats]] (one loop + hash set per row —
    * the interpreted HOF formulation measured ~2 ms/row), so the whole
    * operator is a narrow scan-speed projection with no shuffle before
    * the final sort. */
  val textRepetition: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        expr("trigramStats(split(text, ' '))").as("st"))
      .select(col("doc_id"),
        col("st.n_trigrams").as("n_trigrams"),
        col("st.n_distinct").as("n_distinct"),
        when(col("st.n_trigrams") > 0,
          round(lit(1.0) -
            col("st.n_distinct") / col("st.n_trigrams").cast("double"), 6))
          .otherwise(0.0).as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Scrub patterns: PII shapes (email, IPv4, international phone) plus
    * a configurable term blocklist. Kept to regex features Java and RE2
    * agree on, so the oracle applies the identical patterns. */
  private val scrubPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<email>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<ip>"),
    ("phone", "\\+\\d{7,15}", "<phone>"),
    ("term", "\\b(customer|supplier)\\b", "<term>"))

  /** D20: PII / blocklist scrubbing — count and redact sensitive spans.
    * Chained `regexp_replace` (codegen'd, replace-all in both engines
    * with DuckDB's 'g' flag on the oracle side); the scrubbed text is
    * fingerprinted so the oracle proves the rewrite byte-identical
    * without hauling full text through the compare. */
  val piiScrub: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val scrubbed = scrubPatterns.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    // counting via the native one-pass matcher (r20): the old
    // size(regexp_extract_all(...)) materialized an array of every match
    // per row per pattern just to take its length. Same non-overlapping
    // left-to-right scan, same INT column type (the cast).
    val counts = scrubPatterns.map { case (name, pat, _) =>
      expr(s"countMatches(text, '${pat.replace("\\", "\\\\")}')")
        .cast("int").as(s"n_$name")
    }
    Tables(s, dir, "documents")
      .select(col("doc_id") +: counts :+
        md5(scrubbed).as("scrubbed_md5") :+
        length(scrubbed).as("scrubbed_len"): _*)
      .orderBy("doc_id")
  }

  /** Per-language mixture weights for [[mixSample]] — the data-mixing
    * config a training run would supply. */
  val MixWeights: Seq[(String, Double)] =
    Seq("en" -> 0.5, "fr" -> 1.0, "es" -> 0.25, "de" -> 0.75, "zh" -> 1.0)

  /** D21: weighted data mixing — downsample each language stratum to a
    * target rate. Acceptance is md5 arithmetic per doc (reproducible,
    * partitioning-independent — `sample()` is neither), the weights
    * table broadcast-joins (it is config-sized by construction), and
    * the report is one partial-agg rollup: the corpus is scanned once
    * and never shuffled beyond the per-language aggregate. */
  val mixSample: Q = (s, dir) => {
    import s.implicits._
    val weights = broadcast(MixWeights.toDF("lang", "rate"))
    val u = md5Mod("mix", 10000)
    Tables(s, dir, "documents")
      .join(weights, Seq("lang"), "left")
      .withColumn("keep", u < coalesce(col("rate"), lit(1.0)) * 10000)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("realized_rate",
        round(col("n_sampled") / col("n_docs").cast("double"), 4))
      .orderBy("lang")
  }

  /** Cap for [[mixCap]]: documents kept per language stratum. */
  val CapPerKey = 50

  /** D21b: per-key frequency capping — the C4/RefinedWeb-style "at
    * most N documents per key" pass (domains, licenses, shards: any
    * key whose heavy strata would dominate training). The kept set is
    * the bottom-[[CapPerKey]] by `md5(doc_id)` rank per key via the
    * mergeable [[graft.functions.SampleAgg]] sketch, so each map task
    * reduces its partition to ≤ N ids per key BEFORE the shuffle — a
    * `row_number` window would shuffle every row to its key's reducer,
    * the classic skew bottleneck when one domain is half the corpus.
    * Hash-rank selection is a uniform sample AND deterministic under
    * any partitioning; the oracle replays the identical rank rule. */
  val mixCap: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val docs = Tables(s, dir, "documents")
    docs
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr(s"groupArraySample(doc_id, $CapPerKey)").as("kept_ids"))
      .select(col("lang"), col("n_docs"),
        size(col("kept_ids")).as("n_kept"),
        md5(array_join(col("kept_ids"), ",")).as("kept_md5"))
      .orderBy("lang")
  }

  /** Chunk geometry for [[textChunk]]: 64-token windows, stride 48
    * (16-token overlap) — the embedding-prep shape. */
  val ChunkSize = 64
  val ChunkStride = 48

  /** D23: overlapping document chunking — split every document into
    * fixed-token windows for embedding/indexing. Pure narrow work: one
    * `sequence` explode per doc (O(chunks), no self-join, no shuffle
    * until the final sort), `slice` + fingerprint per chunk so the
    * oracle proves chunk CONTENT byte-identical without hauling text
    * through the compare. Chunk starts are stride multiples; the last
    * window clamps to the document end in both engines. */
  val textChunk: Q = (s, dir) => {
    val nToks = size(col("toks"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        (lit(1) + greatest(lit(0.0),
          ceil((nToks - lit(ChunkSize)) / lit(ChunkStride.toDouble))))
          .cast("int").as("nc"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("nc") - 1)).as("ci"))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        slice(col("toks"), col("ci") * ChunkStride + 1, lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_toks"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** D24: unigram surprisal scoring — the CCNet-style perplexity proxy
    * quality filters cut on. Corpus term frequencies in ONE partial-agg
    * shuffle; the frequency table broadcasts back (vocabulary is
    * sublinear in corpus size; at real scale cap it to top-K with a
    * smoothing floor), so scoring is a map-side join and the only other
    * shuffle is the per-doc aggregate. The oracle replays the identical
    * -ln(cnt/total) arithmetic. */
  val textSurprisal: Q = (s, dir) => {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = tf.agg(sum("cnt").cast("double").as("total"))
    toks.join(broadcast(tf), "tok")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), (-log(col("cnt") / col("total"))).as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(avg("nll"), 6).as("mean_nll"),
        round(exp(avg("nll")), 2).as("ppl"))
      .orderBy("doc_id")
  }

  /** Span length and document-frequency threshold for
    * [[textBoilerplate]]: an 8-gram seen in ≥ 2 distinct documents is
    * treated as boilerplate (at real scale the threshold rises with
    * corpus size; 2 is the interesting setting for the synthetic SF). */
  val SpanLen = 8
  val SpanDf = 2

  /** D26: frequent-span masking — the line/paragraph boilerplate
    * removal pass of a training-data pipeline (C4-style), at token-span
    * granularity: any [[SpanLen]]-gram appearing in ≥ [[SpanDf]]
    * distinct documents is masked OUT of every document, and the doc is
    * re-assembled from the surviving tokens (md5 fingerprint proves the
    * rewrite byte-identical vs the oracle).
    *
    * Scale shape: two narrow passes over the corpus, total, and span
    * STRINGS are never built for non-candidate positions. Pass 1
    * tokenizes once and derives every span's 64-bit key in one native
    * loop ([[graft.functions.SpanKeys]]: xxhash64 each token once,
    * rotate-xor combine per span — no per-span string concat, no
    * interpreted lambda dispatch), and the span-df shuffle carries
    * (hash, doc_id) at 16 bytes/row. Hash-frequent candidates (a small
    * superset of the true frequent set — collisions can only ADD
    * candidates) broadcast back, and the tiny candidate (doc_id, pos)
    * set broadcasts onto the corpus so pass 2 rebuilds span strings
    * ONLY at candidate positions (the corpus itself never shuffles).
    * Those few rows shuffle once by span string; the exact string-df
    * check (which kills any hash collision, making the result equal
    * the all-strings formulation bit-for-bit) and the per-doc hit
    * collection both reuse that one exchange. The final mask is a
    * narrow indexed-lambda filter. No step is quadratic, nothing
    * corpus-sized crosses a shuffle wider than 16 bytes/row, and span
    * strings only ever exist for candidates. */
  val textBoilerplate: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    // pos from posexplode = 0-based start index of the span in toks.
    // (r20 note: checkpointing spanH to dedupe its two consumers was
    // tried and measured flat at sf0.1 — the duplicated spanKeys pass
    // is not where this operator's time goes — so the recompute shape,
    // which needs no materialization at 100 TB, stays.)
    val spanH = docs.select(col("doc_id"),
      posexplode(expr(s"spanKeys(toks, $SpanLen)")).as(Seq("pos", "h")))
    // (r20 note: fusing the df aggregate and the position probe onto one
    // (h, doc_id) exchange was tried and measured flat — column pruning
    // strips the position list from the df copy, so the planner never
    // reuses the exchange and the timing stays within noise of this
    // simpler shape, which therefore stays.)
    // "appears in >= 2 distinct docs" as min(doc_id) != max(doc_id)
    // (r21, guide §2.3 "aggregate before you shuffle"): the
    // countDistinct formulation planned a two-phase distinct — a
    // near-row-count (h, doc_id) hash dedup of the WHOLE exploded span
    // stream through its exchange — where min/max are two fixed-width
    // long buffers that combine map-side, so the exchange carries one
    // partial row per map-side h instead of the stream. Identical
    // selected set for SpanDf == 2 (the guard keeps a threshold bump
    // from silently changing semantics), including all-null doc_ids
    // (min = max = null -> null -> filtered, like countDistinct 0).
    // Measured same-box steady: full query 8.4 -> 6.0 s at sf1,
    // 2.2-2.9 -> 1.4-1.5 s at sf0.1.
    val candHashes = {
      require(SpanDf == 2,
        "min/max distinct-doc test encodes SpanDf == 2; restore " +
          "countDistinct for higher thresholds")
      spanH.groupBy("h")
        .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
        .filter(col("d0") =!= col("d1"))
        .select("h")
    }
    // candidate positions per doc (tiny) broadcast onto the corpus so
    // span strings are built only where a candidate hash occurred; the
    // resulting few rows shuffle ONCE by span string and the exact
    // string-df check and the hit collection both hang off that
    // exchange (ReusedExchange)
    val candPos = spanH.join(broadcast(candHashes), "h")
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).as("ps"))
    val cand = docs.join(broadcast(candPos), "doc_id")
      .select(col("doc_id"), explode(expr(
        s"""transform(ps, p ->
           |  struct(p AS pos, concat_ws(' ', slice(toks, p + 1, $SpanLen)) AS span))""".stripMargin))
        .as("pc"))
      .select(col("doc_id"), col("pc.pos").as("pos"), col("pc.span").as("span"))
      .repartition(col("span"))
    // same min != max rewrite as candHashes (the exact string-df check
    // that kills hash collisions — candidate rows only, so the win is
    // smaller, but the distinct expansion goes away here too)
    val frequent = cand.groupBy("span")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("span")
    val hits = cand.join(frequent, "span")
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).as("starts"))
      .select(col("doc_id"),
        expr(s"array_distinct(flatten(transform(starts, p -> sequence(p, p + ${SpanLen - 1}))))")
          .as("cov"))
    docs.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("cov"), expr("array()")).as("cov"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("filter(toks, (x, i) -> NOT array_contains(cov, i))").as("clean"))
      .select(col("doc_id"), col("n_toks"),
        (col("n_toks") - size(col("clean"))).cast("long").as("n_masked"),
        md5(array_join(col("clean"), " ")).as("clean_md5"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "seq_pack" -> seqPack,
    "text_repetition" -> textRepetition,
    "pii_scrub" -> piiScrub,
    "mix_sample" -> mixSample,
    "mix_cap" -> mixCap,
    "text_chunk" -> textChunk,
    "text_surprisal" -> textSurprisal,
    "text_boilerplate" -> textBoilerplate)

  val oracles: Map[String, String] = Map(
    "seq_pack" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $PackShards AS shard
         |  FROM documents),
         |o AS (
         |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
         |  FROM d),
         |packed AS (
         |  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT AS bin_idx,
         |    n_tokens AS fill
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
         |    CASE WHEN p.fill + o.n_tokens > $PackCapacity
         |         THEN p.bin_idx + 1 ELSE p.bin_idx END,
         |    CASE WHEN p.fill + o.n_tokens > $PackCapacity
         |         THEN o.n_tokens ELSE p.fill + o.n_tokens END
         |  FROM packed p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1)
         |SELECT shard, bin_idx, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |FROM packed GROUP BY shard, bin_idx ORDER BY shard, bin_idx""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3
        |         THEN list_transform(generate_series(1, len(toks) - 2),
        |                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
        |         ELSE [] END AS tri
        |  FROM t)
        |SELECT doc_id, len(tri) AS n_trigrams,
        |  len(list_distinct(tri)) AS n_distinct,
        |  CASE WHEN len(tri) > 0
        |       THEN round(1.0 - len(list_distinct(tri)) / CAST(len(tri) AS DOUBLE), 6)
        |       ELSE 0.0 END AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "pii_scrub" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(text,
        |            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
        |          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ip>', 'g'),
        |        '\+\d{7,15}', '<phone>', 'g'),
        |      '\b(customer|supplier)\b', '<term>', 'g') AS scrubbed
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
        |  CAST(len(regexp_extract_all(text, '\+\d{7,15}')) AS INT) AS n_phone,
        |  CAST(len(regexp_extract_all(text, '\b(customer|supplier)\b')) AS INT) AS n_term,
        |  md5(scrubbed) AS scrubbed_md5,
        |  CAST(length(scrubbed) AS INT) AS scrubbed_len
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |    CAST(1 + greatest(0, ceil((len(toks) - $ChunkSize) / $ChunkStride.0)) AS INT) AS nc
         |  FROM t),
         |x AS (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS ci FROM c),
         |ch AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         |    list_slice(toks, ci * $ChunkStride + 1, ci * $ChunkStride + $ChunkSize) AS chunk
         |  FROM x)
         |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_toks,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM tf)
        |SELECT doc_id, count(*) AS n_toks,
        |  round(avg(-ln(cnt / total)), 6) AS mean_nll,
        |  round(exp(avg(-ln(cnt / total))), 2) AS ppl
        |FROM toks JOIN tf USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mix_sample" ->
      """WITH w(lang, rate) AS (VALUES
        |    ('en', 0.5), ('fr', 1.0), ('es', 0.25), ('de', 0.75), ('zh', 1.0)),
        |d AS (
        |  SELECT doc_id, documents.lang,
        |    ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS u,
        |    coalesce(rate, 1.0) AS rate
        |  FROM documents LEFT JOIN w ON documents.lang = w.lang)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN u < rate * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  round(sum(CASE WHEN u < rate * 10000 THEN 1 ELSE 0 END)
        |        / CAST(count(*) AS DOUBLE), 4) AS realized_rate
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "mix_cap" ->
      s"""WITH ranked AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n_docs
         |  FROM documents)
         |SELECT lang, min(n_docs) AS n_docs,
         |  CAST(count(*) FILTER (WHERE rn <= $CapPerKey) AS INT) AS n_kept,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         |      FILTER (WHERE rn <= $CapPerKey)) AS kept_md5
         |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,
    "text_boilerplate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id, tk,
         |    unnest(range(0, greatest(len(tk) - ${SpanLen - 1}, 1))) AS pos
         |  FROM toks),
         |sh2 AS (
         |  SELECT doc_id, pos,
         |    array_to_string(tk[pos + 1:pos + $SpanLen], ' ') AS span
         |  FROM sh),
         |freq AS (
         |  SELECT span FROM sh2 GROUP BY span
         |  HAVING count(DISTINCT doc_id) >= $SpanDf),
         |cov AS (
         |  SELECT doc_id,
         |    list_distinct(flatten(list(range(pos, pos + $SpanLen)))) AS cov
         |  FROM sh2 SEMI JOIN freq USING (span) GROUP BY doc_id),
         |masked AS (
         |  SELECT t.doc_id, t.tk,
         |    list_filter(t.tk,
         |      (x, i) -> NOT list_contains(coalesce(cov.cov, []), i - 1)) AS clean
         |  FROM toks t LEFT JOIN cov ON t.doc_id = cov.doc_id)
         |SELECT doc_id, len(tk)::BIGINT AS n_toks,
         |  (len(tk) - len(clean))::BIGINT AS n_masked,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM masked ORDER BY doc_id""".stripMargin)
}
