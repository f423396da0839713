package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round helper: execute every declared query once at the
  * given SF with a stderr marker per query, so executor-side WARN/ERROR
  * lines (codegen fallbacks, Janino failures) can be attributed to the
  * query that triggered them.
  *
  * {{{ runMain graft.tools.RunAll [names...] }}}
  */
object RunAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      System.err.println(s"### BEGIN $n")
      try graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"### $n threw: ${e.getMessage}")
      }
      System.err.println(s"### END $n")
    }
    spark.stop()
  }
}
