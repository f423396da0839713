package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which stage of the minhash pipeline dominates. */
object DecompMinhash {
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
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    def docs = graft.Tables(spark, sfDir, "documents")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[decomp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 2) {
      time(s"rep$rep scan")(noop(docs.select(col("doc_id"), col("text"))))
      time(s"rep$rep lower_trim")(noop(docs.select(col("doc_id"), trim(lower(col("text"))).as("t"))))
      time(s"rep$rep norm")(noop(docs.select(col("doc_id"), norm.as("t"))))
      time(s"rep$rep toks")(noop(docs.select(col("doc_id"), split(norm, " ").as("toks"))))
      time(s"rep$rep shingles")(noop(docs.select(col("doc_id"),
        expr("wordShingles(split(regexp_replace(trim(lower(text)), ' +', ' '), ' '), 3)").as("sh"))))
      time(s"rep$rep sig")(noop(docs.select(col("doc_id"),
        expr("minHashSig(wordShingles(split(regexp_replace(trim(lower(text)), ' +', ' '), ' '), 3))").as("sig"))))
      time(s"rep$rep full")(noop(graft.SparkEntry.queries("dedup_minhash")(spark, sfDir)))
    }
    spark.stop()
  }
}
