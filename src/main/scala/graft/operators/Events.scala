package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Batch formulations of the streaming analytics (SURVEY §2 E1/E2) over
  * the `events` table. The Structured Streaming variants in
  * `graft.streaming` share these semantics; the batch forms are what the
  * DuckDB oracle can verify.
  *
  * Scale notes: both are single-shuffle plans — the window aggregation
  * shuffles on (window, event_type); sessionization shuffles once on
  * user_id and both window functions reuse that partitioning.
  */
object Events {

  /** E1 batch form: tumbling 1-hour windows per event type. */
  val evWindowed: Q = (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        ExactAgg.sumExact(col("value"), 100L, 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("window_start", "event_type")

  /** E2 batch form: gap-based sessionization (30-minute inactivity gap).
    * lag → new-session flag → running sum = session index; all three
    * window steps share one hash-partitioning on user_id. */
  val evSessions: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    Tables(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts").cast("timestamp")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum("new_sess").over(byUser))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        ExactAgg.sumExact(col("value"), 100L, 2).as("session_value"),
        round((max(unix_micros(col("ts").cast("timestamp"))) - min(unix_micros(col("ts").cast("timestamp")))) / 1e6, 6)
          .as("duration_sec"))
      .orderBy("user_id", "session_idx")
  }

  /** Binned interval join: for every `error` event, count the same
    * user's `view` events within ±5 minutes. A naive `|t_v - t_e| <= w`
    * join is non-equi, which Spark can only plan as a nested-loop — the
    * classic range-join trap. Binning turns it into an EQUI-join: bin
    * both sides by w-wide buckets, probe each error's {bin-1, bin,
    * bin+1} (a pair within w spans at most adjacent bins, and matches
    * in exactly one shared bin — no dedup needed), post-filter the
    * exact distance. One shuffle on (user_id, bin), scales like any
    * hash join. The oracle runs the plain inequality join. */
  val evErrorContext: Q = (s, dir) => {
    val binUs = 300L * 1000000 // 5 minutes
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("us").as("e_us"))
      .withColumn("bin", explode(array(
        floor(col("e_us") / binUs) - 1,
        floor(col("e_us") / binUs),
        floor(col("e_us") / binUs) + 1)))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("v_us"))
      .withColumn("bin", floor(col("v_us") / binUs))
    errors.join(views, Seq("user_id", "bin"))
      .filter(abs(col("v_us") - col("e_us")) <= binUs)
      .groupBy("user_id", "event_id")
      .agg(count(lit(1)).as("ctx_views"))
      .orderBy("user_id", "event_id")
  }

  /** E1b batch form: hopping 1-hour windows sliding every 15 minutes —
    * every event lands in exactly 4 windows (epoch-aligned slides, the
    * same alignment Spark's window generator uses). The oracle explodes
    * the 4 slide offsets per event. */
  val evHopping: Q = (s, dir) =>
    graft.streaming.EventStreams
      .hoppingCounts(Tables(s, dir, "events"))
      .orderBy("window_start", "event_type")

  /** E2b: the same 30-minute-gap sessions through Spark's native
    * `session_window` aggregate (see
    * [[graft.streaming.EventStreams.sessionWindows]]) — one mergeable
    * aggregation instead of three window-function passes. The oracle
    * replays session_window's boundary rule: a gap of exactly 30:00
    * STARTS a new session (window end is exclusive). */
  val evSessionsNative: Q = (s, dir) =>
    graft.streaming.EventStreams
      .sessionWindows(Tables(s, dir, "events"))
      .orderBy("user_id", "session_start")

  /** E9 batch twin: hourly per-user activity, top-3 users per hour —
    * the leaderboard the streaming
    * [[graft.streaming.EventStreams.userActivity]] maintains
    * incrementally (same read-side finisher composes both). */
  val evTopUsers: Q = (s, dir) => {
    val activity = Tables(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        ExactAgg.sumExact(col("value"), 100L, 2).as("sum_value"))
    graft.streaming.EventStreams.topOfWindows(activity, 3)
      .orderBy("window_start", "rn")
  }

  val queries: Map[String, Q] = Map(
    "ev_windowed" -> evWindowed,
    "ev_hopping" -> evHopping,
    "ev_sessions" -> evSessions,
    "ev_sessions_native" -> evSessionsNative,
    "ev_top_users" -> evTopUsers,
    "ev_error_context" -> evErrorContext)

  val oracles: Map[String, String] = Map(
    "ev_top_users" ->
      """WITH a AS (
        |  SELECT date_trunc('hour', ts) AS window_start, user_id,
        |    count(*) AS n_events, round(sum(CAST(round(value * 100.0) AS BIGINT)) / 1e2, 2) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY window_start
        |             ORDER BY n_events DESC, user_id) AS rn
        |  FROM a)
        |SELECT CAST(window_start AS TIMESTAMP) AS window_start, user_id,
        |  n_events, sum_value, CAST(rn AS INT) AS rn
        |FROM r WHERE rn <= 3 ORDER BY window_start, rn""".stripMargin,
    "ev_windowed" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(CAST(round(value * 100.0) AS BIGINT)) / 1e2, 2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess,
        |    event_id
        |  FROM g),
        |x AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  round(sum(CAST(round(value * 100.0) AS BIGINT)) / 1e2, 2) AS session_value,
        |  round((max(epoch_us(ts)) - min(epoch_us(ts))) / 1e6, 6) AS duration_sec
        |FROM x GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    "ev_hopping" ->
      """WITH w AS (
        |  SELECT CAST(to_timestamp((floor(epoch(ts) / 900) - k) * 900)
        |              AS TIMESTAMP) AS window_start,
        |    event_type, value
        |  FROM events, unnest(generate_series(0, 3)) AS t(k))
        |SELECT window_start, event_type,
        |  count(*) AS n_events, round(sum(CAST(round(value * 100.0) AS BIGINT)) / 1e2, 2) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sessions_native" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_sess,
        |    event_id
        |  FROM g),
        |x AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events, round(sum(CAST(round(value * 100.0) AS BIGINT)) / 1e2, 2) AS session_value
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin,
    "ev_error_context" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |e AS (SELECT user_id, event_id, us FROM ev WHERE event_type = 'error'),
        |v AS (SELECT user_id, us FROM ev WHERE event_type = 'view')
        |SELECT e.user_id, e.event_id, count(*) AS ctx_views
        |FROM e JOIN v ON v.user_id = e.user_id
        |            AND abs(v.us - e.us) <= 300000000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
