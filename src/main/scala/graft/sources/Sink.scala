package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-side counterpart to [[FileSource]] (SURVEY §2 C5): parquet /
  * csv / json sinks with optional hash-partitioned layout, plus
  * small-file compaction.
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

  /** Compact a parquet directory to ~`targetFileBytes` output files —
    * the maintenance pass every incrementally-written table needs:
    * streaming sinks and per-batch appends leave thousands of small
    * files whose open/footer costs dominate a later 100 TB scan.
    *
    * File count is sized from the directory's actual on-disk bytes
    * (driver-side listing, no data read), the rows flow through ONE
    * `coalesce` — a narrow, shuffle-free repack — and the rewrite goes
    * to a staging path first so a crash mid-compaction can never
    * destroy the source directory. Returns (files before, files after).
    */
  def compactParquet(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val parts = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= nOut) return (parts.length, parts.length)

    val staging = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.compact.tmp")
    fs.delete(staging, true)
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    // swap: the old directory disappears only after the new one is
    // fully written; rename is atomic per directory on HDFS-like stores
    val backup = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.compact.old")
    fs.delete(backup, true)
    if (!fs.rename(p, backup))
      throw new java.io.IOException(s"compact: cannot stage out $p")
    if (!fs.rename(staging, p)) {
      fs.rename(backup, p) // restore on failure
      throw new java.io.IOException(s"compact: cannot publish $staging")
    }
    fs.delete(backup, true)
    val after = fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
