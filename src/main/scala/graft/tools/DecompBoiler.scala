package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time text_boilerplate's component frames separately. */
object DecompBoiler {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val spanH = docs.select(col("doc_id"),
      posexplode(expr("spanKeys(toks, 8)")).as(Seq("pos", "h")))
    val candHashes = spanH.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 2).select("h")
    val candPos = spanH.join(broadcast(candHashes), "h")
      .groupBy("doc_id").agg(collect_list(col("pos")).as("ps"))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[decomp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (rep <- 1 to 2) {
      time(s"rep$rep spanH")(spanH.write.format("noop").mode("overwrite").save())
      time(s"rep$rep candHashes")(candHashes.write.format("noop").mode("overwrite").save())
      time(s"rep$rep candPos")(candPos.write.format("noop").mode("overwrite").save())
      time(s"rep$rep maskOnly")(docs.select(col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          md5(array_join(expr("filter(toks, (x, i) -> NOT array_contains(array(), i))"), " ")).as("m"))
        .write.format("noop").mode("overwrite").save())
      time(s"rep$rep full")(graft.SparkEntry.queries("text_boilerplate")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
