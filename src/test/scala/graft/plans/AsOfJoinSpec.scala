package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof semantics on a hand-built fixture") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:01:00"), 200.0))
      .toDF("k", "t", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:30"), 10), // matches 10:00 quote
      (1L, ts("2024-01-01 10:06:00"), 20), // matches 10:05 quote
      (2L, ts("2024-01-01 10:00:00"), 30), // before any quote: null
      (3L, ts("2024-01-01 10:00:00"), 40)) // key without quotes: null
      .toDF("k", "t", "qty")

    val out = AsOf.join(trades, quotes, key = ("k", "k"), time = ("t", "t"))
      .select(col("k"), col("qty"), col("r_px"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out == Set(
      (1L, 10, 100.0),
      (1L, 20, 101.0),
      (2L, 30, null),
      (3L, 40, null)))
  }

  test("all four inequality directions on a boundary fixture") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0))
      .toDF("k", "t", "px")
    // trade exactly ON the 10:05 quote: inclusivity decides the match
    val trades = Seq((1L, ts("2024-01-01 10:05:00"), 1)).toDF("k", "t", "qty")
    def run(forward: Boolean, strict: Boolean): Any = {
      val r = AsOf.join(trades, quotes, ("k", "k"), ("t", "t"), forward, strict)
        .select("r_px").head
      if (r.isNullAt(0)) null else r.getDouble(0)
    }
    assert(run(forward = false, strict = false) == 101.0) // >=: the 10:05 quote
    assert(run(forward = false, strict = true) == 100.0)  // >: latest strictly before
    assert(run(forward = true, strict = false) == 101.0)  // <=: the 10:05 quote
    assert(run(forward = true, strict = true) == null)    // <: nothing after
  }

  test("forward match is shared: one right row serves many left rows") {
    import spark.implicits._
    val quotes = Seq((1L, ts("2024-01-01 11:00:00"), 500.0)).toDF("k", "t", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1),
      (1L, ts("2024-01-01 10:30:00"), 2),
      (1L, ts("2024-01-01 11:30:00"), 3)) // after the only quote: null
      .toDF("k", "t", "qty")
    val out = AsOf.join(trades, quotes, ("k", "k"), ("t", "t"), forward = true)
      .select(col("qty"), col("r_px"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getDouble(1))).toSet
    assert(out == Set((1, 500.0), (2, 500.0), (3, null)))
  }

  test("custom exec agrees with the composed conditional-join formulation") {
    val ev = graft.Tables(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))

    val custom = AsOf.join(clicks, errors.select(
      col("e_id").as("event_id"), col("e_user").as("user_id"), col("e_ts").as("ts")),
      key = ("user_id", "user_id"), time = ("ts", "ts"))
      .select(col("event_id"), col("r_event_id").as("match_id"))

    val composed = clicks
      .join(errors, col("user_id") === col("e_user") && col("e_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_id").orderBy(col("e_ts").desc, col("e_id").desc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("e_id").as("match_id"))

    val c = custom.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val m = composed.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(c.size == m.size)
    assert(c == m)
  }

  test("physical plan is the custom sort-merge operator, one shuffle per side") {
    val ev = graft.Tables(spark, sf, "events")
    val l = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val df = AsOf.join(l, r, key = ("user_id", "user_id"), time = ("ts", "ts"))
    df.collect()
    // AQE renders both final and initial plans; count only the final
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin "), plan.take(500))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"expected <=2 shuffles, got $shuffles")
  }
}
