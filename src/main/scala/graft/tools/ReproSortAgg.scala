package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sql.{QueryGuard, TableEnv}

/** Dev probe: which aggregate forces q_ch_url's SortAggregate chain. */
object ReproSortAgg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TableEnv.register(spark, sfDir)
    val cases = Seq(
      "min_string" ->
        "SELECT o_orderpriority, min(o_orderstatus) AS m FROM orders GROUP BY 1",
      "count_distinct" ->
        "SELECT o_orderpriority, uniqExact(o_custkey) AS n FROM orders GROUP BY 1",
      "cd_plus_minstr" ->
        "SELECT o_orderpriority, uniqExact(o_custkey) AS n, min(o_orderstatus) AS m FROM orders GROUP BY 1",
      "cd_string" ->
        "SELECT o_orderpriority, uniqExact(concat(o_orderstatus, o_custkey)) AS n FROM orders GROUP BY 1"
    )
    cases.foreach { case (name, sql) =>
      val df = QueryGuard.plan(spark, sql)
      val phys = df.queryExecution.executedPlan.toString
      val kinds = Seq("SortAggregate", "HashAggregate", "ObjectHashAggregate")
        .map(k => s"$k=${phys.sliding(k.length).count(_ == k)}").mkString(" ")
      println(s"### $name: $kinds")
    }
    spark.stop()
  }
}
