package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off decomposition of q_ch_url's sf1 cost: synth-concat only vs
  * synth+one-parse vs the full 6-field query (runMain
  * graft.tools.UrlProfile [sfDir]). */
object UrlProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CHFunctions.register(spark)
    graft.sql.TableEnv.register(spark, dir)
    val synth =
      """WITH u AS (
        |  SELECT concat('https://www.shard', o_orderkey % 3,
        |                '.example', o_orderkey % 2, '.com/',
        |                substr(o_orderpriority, 1, 1),
        |                '/item?id=', o_orderkey, '&ref=mail') AS url
        |  FROM orders)""".stripMargin
    val variants = Seq(
      "scan_only" -> "SELECT count(*) AS n, min(o_orderkey) FROM orders",
      "synth_only" -> s"$synth SELECT count(*) AS n, min(url) AS m FROM u",
      "synth_one_parse" ->
        s"$synth SELECT count(*) AS n, min(protocol(url)) AS p FROM u",
      "synth_all_parse_nogroup" ->
        (s"$synth SELECT count(*) AS n, min(protocol(url)) AS p, " +
          "min(domainWithoutWWW(url)) AS h, min(topLevelDomain(url)) AS t, " +
          "min(pathCH(url)) AS pa, min(cutQueryString(url)) AS c, " +
          "min(extractURLParameter(url, 'id')) AS i FROM u"))
    variants.foreach { case (label, q) =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.sql.QueryGuard.plan(spark, q)
          .write.format("noop").mode("overwrite").save()
        println(f"[urlprofile] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_ch_url")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[urlprofile] full_query run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
