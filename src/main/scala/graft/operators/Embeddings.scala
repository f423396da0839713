package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Vector analytics over the `embeddings` table beyond search:
  * per-label centroids and dispersion (the building blocks of IVF
  * training, cluster QA and embedding-drift monitoring).
  *
  * Scale shape: centroids are computed by exploding (vec_id, pos,
  * component) and aggregating on (label, pos) — ONE shuffle keyed by
  * (label, dim) with full map-side partial aggregation; dimensions are
  * small (64) so the reduced state is tiny regardless of corpus size.
  */
object Embeddings {

  /** Per-label centroid norm + cohesion (avg cosine of members to the
    * label centroid, via the codegen'd cosineSimilarity). */
  val embCentroids: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

    // (label, pos) -> mean component; ONE wide dependency
    val centroids = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg("x").as("cx"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label"),
        expr("transform(pairs, p -> p.cx)").as("centroid"))

    e.join(centroids, "label")
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        round(sqrt(expr(
          "aggregate(transform(first(centroid), x -> x * x), 0D, (a, x) -> a + x)")), 6)
          .as("centroid_norm"),
        round(avg(expr("cosineSimilarity(v, centroid)")), 6).as("cohesion"))
      .orderBy("label")
  }

  val queries: Map[String, Q] = Map("emb_centroids" -> embCentroids)

  val oracles: Map[String, String] = Map(
    "emb_centroids" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |comp AS (
        |  SELECT label, t.i AS pos, avg(v[t.i]) AS cx
        |  FROM e, unnest(generate_series(1, len(v))) AS t(i)
        |  GROUP BY label, t.i),
        |cent AS (
        |  SELECT label, list(cx ORDER BY pos) AS centroid FROM comp GROUP BY label)
        |SELECT e.label, count(*) AS n_vectors,
        |  round(sqrt(list_sum(list_transform(any_value(cent.centroid), x -> x * x))), 6) AS centroid_norm,
        |  round(avg(list_cosine_similarity(e.v, cent.centroid)), 6) AS cohesion
        |FROM e JOIN cent ON e.label = cent.label
        |GROUP BY e.label ORDER BY e.label""".stripMargin)
}
