package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** File-backed table functions with the chDB surface the reference
  * exposes (reference: mcp_clickhouse/mcp_server.py:513-570 and
  * chdb_prompt.py: `file()/url()/s3()/hdfs()` with format
  * auto-detection).
  *
  * Spark-first: every function returns a lazy DataFrame whose scan the
  * reader plans natively (parquet/orc footers, csv/json schema
  * inference), so pushdown and pruning apply as usual. Scheme routing is
  * Hadoop-FS routing — `s3a://`, `hdfs://`, `file://` paths all flow
  * through the same reader; no separate client stacks.
  */
object FileSource {

  /** ClickHouse format name → (spark format, options). */
  private val formats: Map[String, (String, Map[String, String])] = Map(
    "parquet" -> ("parquet", Map.empty),
    "orc" -> ("orc", Map.empty),
    "avro" -> ("avro", Map.empty),
    "csv" -> ("csv", Map("header" -> "false", "inferSchema" -> "true")),
    "csvwithnames" -> ("csv", Map("header" -> "true", "inferSchema" -> "true")),
    "tsv" -> ("csv", Map("header" -> "false", "inferSchema" -> "true", "sep" -> "\t")),
    "tsvwithnames" -> ("csv", Map("header" -> "true", "inferSchema" -> "true", "sep" -> "\t")),
    "json" -> ("json", Map.empty),
    "jsoneachrow" -> ("json", Map.empty))

  /** Extension → ClickHouse format name (chDB auto-detection). */
  private def detect(path: String): String = {
    val name = path.toLowerCase
    val base = name.stripSuffix(".gz").stripSuffix(".zst")
    base.split('.').lastOption match {
      case Some("parquet") => "parquet"
      case Some("orc") => "orc"
      case Some("avro") => "avro"
      case Some("csv") => "csvwithnames"
      case Some("tsv") => "tsvwithnames"
      case Some("json") | Some("jsonl") | Some("ndjson") => "jsoneachrow"
      case other => throw new IllegalArgumentException(
        s"cannot auto-detect format for '$path' (extension $other); pass a format")
    }
  }

  /** `file(path[, format])` — chDB's in-place file query. */
  def file(spark: SparkSession, path: String, format: Option[String] = None): DataFrame = {
    val fmtName = format.map(_.toLowerCase).getOrElse(detect(path))
    val (fmt, opts) = formats.getOrElse(fmtName,
      throw new IllegalArgumentException(s"unsupported format '$fmtName'"))
    reader(spark, opts).format(fmt).load(path)
  }

  /** `url()/s3()/hdfs()` — scheme routing. Spark's Hadoop FS layer
    * resolves the scheme; s3/s3n are normalized to s3a. */
  def route(spark: SparkSession, uri: String, format: Option[String] = None): DataFrame = {
    val normalized = uri.replaceFirst("^s3n?://", "s3a://")
    file(spark, normalized, format)
  }

  private def reader(spark: SparkSession, opts: Map[String, String]): DataFrameReader =
    opts.foldLeft(spark.read) { case (r, (k, v)) => r.option(k, v) }
}
