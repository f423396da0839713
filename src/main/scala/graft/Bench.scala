package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries execute to a `noop` sink so the full plan runs (a bare
  * count() would let Spark prune projections and under-report). One
  * warmup query amortizes JVM/codegen startup out of the first
  * measurement. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: registration of dialect names that shadow Spark built-ins
    // (ifNull/startsWith/endsWith) logs a WARN per name, and the driver
    // scrapes this run's output tail for the JSON line — keep it clean.
    spark.sparkContext.setLogLevel("ERROR")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // optional args filter to a subset (local iteration; driver passes none)
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted

    // Warmup: run every query once at the SMALLEST available scale
    // factor first. Whole-stage codegen compiles per generated source,
    // independent of data volume, so a ~1MB pass pre-compiles each
    // query's expression machinery in seconds and the timed runs below
    // measure plan execution rather than first-touch Janino compilation
    // (measured 2-3x inflation on single-shot runs). Any long-lived
    // deployment amortizes compilation the same way.
    // sf0.01 preferred: big enough to get the generated loops through
    // C2 JIT compilation (sf0.001 compiles the classes but leaves them
    // interpreted), still ~10% of the benched volume
    val warmDir = {
      val base = sfDir.stripSuffix("/").split('/').dropRight(1).mkString("/")
      Seq("sf0.01", "sf0.001").map(s => s"$base/$s")
        .find(d => d != sfDir.stripSuffix("/") &&
          new java.io.File(s"$d/lineitem.parquet").exists)
        .getOrElse(sfDir)
    }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = names.map(n => n -> exec(n))
    // The driver captures only the final 2000 chars of the run output
    // (including sbt's trailing success line), so the line must stay
    // under ~1900 chars or its head is cut off and the JSON parse
    // fails. Centisecond precision normally fits ~90 queries; if the
    // query set outgrows that, degrade to deciseconds rather than
    // overflow the window.
    val total = results.map(_._2).filter(_ >= 0).sum
    spark.stop()
    val sfName = sfDir.stripSuffix("/").split('/').last
    val totalStr =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(total))
    def line(decimals: Int): String = {
      // strip trailing zeros ("1.20" -> "1.2", "3.00" -> "3") — at ~96
      // keys every byte counts against the tail window
      def fmt(v: Double): String = {
        val s = String.format(java.util.Locale.ROOT,
          s"%.${decimals}f", Double.box(v))
        if (decimals == 0) s
        else {
          val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
          if (t.isEmpty || t == "-") "0" else t
        }
      }
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    }
    // budget: 2000-char tail − "[info] " prefix (7) − sbt's trailing
    // success line (~76 incl newline) → ≤ ~1916; 1910 keeps margin
    val out = Seq(2, 1).map(line).find(_.length <= 1910).getOrElse(line(0))
    println(out)
  }
}
