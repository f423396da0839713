package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.plans.AsOf

/** ASOF-join query over `events` (SURVEY §2 B4: the CH dialect's ASOF
  * JOIN): for every click, the user's most recent error at or before
  * the click, through the custom sort-merge operator
  * [[graft.plans.AsOfJoinExec]]. Verified against DuckDB's native
  * `ASOF LEFT JOIN`. */
object AsOfQueries {

  val qAsofJoin: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")
    AsOf.join(clicks, errors, key = ("user_id", "user_id"), time = ("ts", "ts"))
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("prior_error_id"),
        round(col("r_value"), 2).as("prior_error_value"))
      .orderBy("event_id")
  }

  /** Forward variant: for every click, the user's NEXT error at or
    * after the click — the time-to-failure side of the same operator. */
  val qAsofForward: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")
    AsOf.join(clicks, errors, key = ("user_id", "user_id"), time = ("ts", "ts"),
        forward = true)
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("next_error_id"),
        round(col("r_value"), 2).as("next_error_value"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> qAsofJoin,
    "q_asof_forward" -> qAsofForward)

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT a.event_id, a.user_id,
        |  b.event_id AS prior_error_id,
        |  round(b.value, 2) AS prior_error_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY a.event_id""".stripMargin,
    "q_asof_forward" ->
      """SELECT a.event_id, a.user_id,
        |  b.event_id AS next_error_id,
        |  round(b.value, 2) AS next_error_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
        |  ON a.user_id = b.user_id AND a.ts <= b.ts
        |ORDER BY a.event_id""".stripMargin)
}
