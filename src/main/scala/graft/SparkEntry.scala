package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry proves. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    Relational.queries ++ SqlSurface.queries ++ TextOps.queries ++
      Events.queries ++ Dedup.queries ++ Ann.queries ++
      Introspection.queries ++ ChSurface.queries ++ Multimodal.queries ++
      AsOfQueries.queries ++ Embeddings.queries ++ Pipeline.queries ++
      Funnel.queries ++ Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ SqlSurface.oracles ++ TextOps.oracles ++
      Events.oracles ++ Dedup.oracles ++ Ann.oracles ++ ChSurface.oracles ++
      AsOfQueries.oracles ++ Introspection.oracles ++ Embeddings.oracles ++
      Pipeline.oracles ++ Funnel.oracles ++ Curation.oracles ++
      Multimodal.oracles
}
