package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Access to the driver-generated parquet tables (TESTDATA.md): a
  * TPC-H-ish star schema plus `events` (stream-shaped), `documents`
  * (text corpus) and `embeddings` (vector table).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed-plan cache: the footer/schema work of `read.parquet` runs
    * once per (session, path) instead of once per query — DataFrames are
    * immutable plans, so reuse is safe within a session. The warehouse
    * tables are written once by the driver; anything mutable (temp dirs,
    * sinks) is read through [[graft.sources.FileSource]], not here.
    * Bounded: a full clear past [[CacheCap]] entries keeps a
    * many-session or many-directory process (tests, per-request
    * sessions) from pinning stopped sessions' plans forever. */
  private val CacheCap = 128
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (cache.size > CacheCap) cache.clear()
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"), { case (s, path) =>
      // Spark cannot represent nanosecond parquet timestamps (events.ts is
      // timestamp[ns]); read them as nanosecond longs and truncate to
      // microseconds — the same truncation DuckDB applies, so oracles match.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(path)
      df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
        case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case None => df
      }
    })
  }
}
