package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side counterpart to [[FileSource]] (SURVEY §2 C5): parquet /
  * csv / json sinks with optional hash-partitioned layout.
  *
  * `partitionBy` columns become directory partitions — the layout that
  * lets a later read prune partitions instead of listing 100 TB. */
object Sink {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit =
    writer(df, partitionBy, mode).parquet(path)

  def csv(df: DataFrame, path: String, header: Boolean = true,
      partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit =
    writer(df, partitionBy, mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit =
    writer(df, partitionBy, mode).json(path)

  private def writer(df: DataFrame, partitionBy: Seq[String], mode: String) = {
    val w = df.write.mode(mode)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }
}
