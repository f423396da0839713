package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time dedup_jaccard's component frames separately. */
object DecompJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CHFunctions.register(spark)
    val docs = graft.Tables(spark, sfDir, "documents")
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    def shingled = docs.withColumn("toks", split(norm, " "))
      .withColumn("shingles",
        transform(
          sequence(lit(1), greatest(size(col("toks")) - 2, lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(3)))))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[decomp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (rep <- 1 to 2) {
      time(s"rep$rep full_bcast")(graft.SparkEntry.queries("dedup_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time(s"rep$rep full_nobcast")(graft.SparkEntry.queries("dedup_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    spark.stop()
  }
}
