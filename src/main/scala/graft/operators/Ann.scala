package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §2 D6/D7).
  *
  * D6 `ann_bruteforce` is the exact baseline: the (small) query set is
  * broadcast, every candidate partition computes dot products map-side,
  * and only (n_queries × n_candidates) similarity rows — never vectors —
  * reach the per-query top-k shuffle. Verified against DuckDB
  * `list_cosine_similarity`.
  *
  * D7 `ann_ivf` is the 100 TB path: an IVF-style coarse quantizer. Cell
  * centroids are a deterministic sample, every vector is assigned to its
  * nearest cell (one map-side broadcast pass + one shuffle on vec_id),
  * queries probe their `nprobe` nearest cells, and the top-k runs over
  * probed cells only — at 1000 executors the scan prunes to
  * nprobe/n_cells of the corpus. Rows-only for the driver; `AnnSpec`
  * asserts recall vs the brute-force truth.
  */
object Ann {

  private val K = 5
  private val NumQueries = 10
  private val NumCells = 16
  private val NProbe = 4

  /** Embeddings as double vectors; similarity runs through the
    * codegen'd [[graft.functions.CosineSimilarity]] expression. */
  private def unitVectors(s: SparkSession, dir: String): DataFrame = {
    graft.functions.CHFunctions.register(s)
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private def dot(a: String, b: String): Column =
    expr(s"cosineSimilarity($a, $b)")

  /** D6: exact cosine top-k, queries broadcast. */
  val annBruteforce: Q = (s, dir) => {
    val e = unitVectors(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "v"), 4).as("cos_sim"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("neighbor"))))
      .filter(col("rn") <= K)
      .orderBy("q_id", "rn")
  }

  /** Lloyd iterations over the corpus: each pass is two shuffles
    * (assign via broadcast centroids + recompute keyed (cell, dim)).
    * Seeded deterministically from the first k vectors, so results are
    * reproducible run-to-run — at 100 TB you'd train on a sample, but
    * the plan shape is identical. */
  private def trainCentroids(e: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    for (_ <- 0 until iters) {
      val assigned = e.join(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cell"),
          dot("v", "cv").as("ccos"))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell"))))
        .filter(col("crn") === 1)
        .select(col("cell"), col("v"))
      cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg("x").as("cx"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
        .select(col("cell"), expr("transform(pairs, p -> p.cx)").as("cv"))
        .localCheckpoint() // truncate the growing lineage between passes
    }
    cents
  }

  /** D7: IVF coarse quantizer — k-means-trained centroids (2 Lloyd
    * passes over deterministic seeds), nearest-cell assignment,
    * nprobe-cell search. */
  val annIvf: Q = (s, dir) => {
    val e = unitVectors(s, dir)
    val cents = trainCentroids(e, NumCells, iters = 2)

    // nearest cell per vector: broadcast the centroid table, keep the
    // argmax cell — ties break to the lower cell id.
    def assign(df: DataFrame, idCol: String, vecCol: String, top: Int): DataFrame =
      df.join(broadcast(cents))
        .select(col(idCol), col(vecCol),
          col("cell"), dot(vecCol, "cv").as("ccos"))
        .withColumn("crn", row_number().over(
          Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cell"))))
        .filter(col("crn") <= top)

    val assigned = assign(e, "vec_id", "v", 1)
      .select(col("cell"), col("vec_id"), col("v"))
    val queries = assign(
      e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv")),
      "q_id", "qv", NProbe)
      .select(col("cell"), col("q_id"), col("qv"))

    queries.join(assigned, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "v"), 4).as("cos_sim"))
      .distinct() // a neighbor may appear via several probed cells
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("neighbor"))))
      .filter(col("rn") <= K)
      .orderBy("q_id", "rn")
  }

  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> annBruteforce,
    "ann_ivf" -> annIvf)

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor,
         |    round(list_cosine_similarity(q.v, c.v), 4) AS cos_sim
         |  FROM e q JOIN e c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < $NumQueries),
         |r AS (
         |  SELECT q_id, neighbor, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_sim DESC, neighbor) AS rn
         |  FROM s)
         |SELECT q_id, neighbor, cos_sim, rn FROM r
         |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin)
}
