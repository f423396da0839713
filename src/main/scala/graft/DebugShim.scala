package graft
/** Throwaway dev main: run pasted queries through the served path. */
object DebugShim {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CHFunctions.register(spark)
    graft.sql.TableEnv.register(spark, "/root/testdata/sf0.001")
    args.foreach { q =>
      try {
        val df = graft.sql.QueryGuard.plan(spark, q)
        val rows = df.limit(5).collect()
        println(s"OK (${rows.length} rows): $q")
        println(s"  schema: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
        rows.foreach(r => println(s"  row: $r"))
      } catch { case e: Throwable =>
        println(s"FAIL: $q\n  -> ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
