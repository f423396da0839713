package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round probe: split each declared query's wall time
  * into (a) DataFrame construction — parse, shim pipeline, analysis —
  * and (b) execution to the noop sink, after one warmup pass of both.
  * Prints a sorted table so the driver-side planning floor (guide
  * §7.3: "planning time itself can become the bottleneck") can be
  * attributed per query.
  *
  * {{{ runMain graft.tools.PlanCost [names...] }}}
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // warmup: codegen + JIT, like Bench
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val out = names.flatMap { n =>
      try {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        Some((n, (t1 - t0) / 1e9, (t2 - t1) / 1e9))
      } catch { case _: Throwable => None }
    }
    val byTotal = out.sortBy { case (_, b, e) => -(b + e) }
    println(f"${"query"}%-28s ${"build"}%8s ${"exec"}%8s")
    byTotal.foreach { case (n, b, e) => println(f"$n%-28s $b%8.3f $e%8.3f") }
    val bsum = out.map(_._2).sum
    val esum = out.map(_._3).sum
    println(f"[plancost] n=${out.size} build_total=$bsum%.1f exec_total=$esum%.1f")
    spark.stop()
  }
}
