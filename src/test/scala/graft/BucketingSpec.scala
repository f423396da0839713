package graft

import org.apache.spark.sql.functions._

/** SURVEY §4: pre-bucketing both sides of a recurring join key removes
  * the join shuffle entirely — the co-location strategy for the joins a
  * 100 TB pipeline runs every day. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      // the join itself introduces no shuffle: both sides pre-bucketed,
      // and the groupBy on the bucket key reuses that partitioning too
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
