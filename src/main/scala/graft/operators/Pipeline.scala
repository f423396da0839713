package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** End-to-end training-data cleaning pass (composition of the D
  * operators): quality-gate the corpus, drop near-duplicates (keep the
  * lower doc id of each LSH-confirmed pair), report per-language
  * surviving token counts.
  *
  * This is the shape of a real corpus-prep job: all narrow per-row
  * scoring, one shuffle for candidate pairs, one anti-join against the
  * drop set — nothing quadratic, nothing driver-side. */
object Pipeline {

  val pipelineClean: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val toks = split(col("text"), " ")

    // quality gate: enough distinct tokens and a sane length
    val scored = docs.select(
      col("doc_id"), col("lang"), col("text"),
      size(toks).as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("distinct_ratio"))
    val kept = scored.filter(col("n_tokens") >= 10 && col("distinct_ratio") >= 0.5)

    // near-dup drop set: the higher doc id of every confirmed pair
    val dropped = Dedup.dedupJaccard(s, dir)
      .filter(col("jaccard") >= 0.3)
      .select(col("doc_b").as("doc_id"))
      .distinct()

    kept.join(dropped, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("distinct_ratio"), 6).as("avg_distinct_ratio"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map("pipeline_clean" -> pipelineClean)

  val oracles: Map[String, String] = Map(
    "pipeline_clean" -> {
      // reuse the dedup pair pipeline CTEs, then the same gates
      val pairs = Dedup.oracles("dedup_jaccard")
        .replaceAll("ORDER BY doc_a, doc_b$", "")
      s"""WITH jac AS ($pairs),
         |scored AS (
         |  SELECT doc_id, lang,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    len(list_distinct(string_split(text, ' '))) /
         |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored WHERE n_tokens >= 10 AND distinct_ratio >= 0.5),
         |dropped AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM jac WHERE jaccard >= 0.3)
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(distinct_ratio), 6) AS avg_distinct_ratio
         |FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |GROUP BY lang ORDER BY lang""".stripMargin
    })
}
