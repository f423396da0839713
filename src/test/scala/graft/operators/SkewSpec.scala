package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "other"))
      .toDF("k", "label")

    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "payload", "label").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
      .select("k", "payload", "label").collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "label")
    val out = Skew.saltedJoin(big, small, "k", factor = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).getOrElse("-"))).sorted.toSeq
    assert(out == Seq((1L, "a", "x"), (2L, "b", "-"), (3L, "c", "-")))
  }
}
