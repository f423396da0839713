package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sql.{QueryGuard, TableEnv}

/** Dev probe: which aggregate dominates q_ch_bits at scale. */
object DecompBits {
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
    TableEnv.register(spark, sfDir)
    def time(name: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      QueryGuard.plan(spark, sql).write.format("noop").mode("overwrite").save()
      println(f"[decomp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val pre = "WITH t AS (SELECT o_orderkey AS k, modulo(multiply(o_orderkey, 2654435761), 4294967296) AS ip FROM orders)"
    for (rep <- 1 to 2) {
      time(s"rep$rep scan_count", s"$pre SELECT count(*) FROM t")
      time(s"rep$rep city_distinct", s"$pre SELECT uniqExact(cityHash64(k)) FROM t")
      time(s"rep$rep both_distinct", s"$pre SELECT uniqExact(cityHash64(k)) AS a, uniqExact(sipHash64(k)) AS b FROM t")
      time(s"rep$rep halfmd5_minmax", s"$pre SELECT min(halfMD5(cast(k AS STRING))) AS a, max(halfMD5(cast(k AS STRING))) AS b FROM t")
      time(s"rep$rep ip_bits", s"$pre SELECT countIf(IPv4StringToNum(IPv4NumToString(ip)) = ip) AS a, min(IPv4NumToString(ip)) AS b, sum(bitAnd(k, 255)) AS c, sum(bitCount(k)) AS d, countIf(bitShiftRight(bitShiftLeft(k, 3), 3) = k) AS e FROM t")
    }
    // full query through the declared path
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q_ch_bits")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[decomp] declared_full: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
