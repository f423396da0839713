package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one query repeatedly and dump its formatted plan.
  *
  * {{{
  *   runMain graft.Profile <name> [reps] [sfDir]
  * }}}
  *
  * Reps > 1 separate plan-compile cost (first run) from steady-state
  * execution; Bench measures cold single-shot, this answers "where does
  * the time go".
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val q = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").forall(_ == "true"))
      q(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
