package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-generated parquet tables (TESTDATA.md): a
  * TPC-H-ish star schema plus `events` (stream-shaped), `documents`
  * (text corpus) and `embeddings` (vector table).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
