package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Funnel and retention analysis over `events` — the signature
  * ClickHouse workloads (`windowFunnel`, `retention`) re-expressed as
  * DataFrame graphs (SURVEY §2 B4).
  *
  * Scale shape: each funnel stage is one filtered aggregation keyed by
  * user (map-side combine); stages chain through user-keyed joins that
  * all reuse the same hash partitioning. Retention is a single
  * user×day dedup + one self-join on the cohort key.
  */
object Funnel {

  private val WindowUs = 3600L * 1000000 // 1 hour funnel window

  /** windowFunnel-style: per user, how deep into view → click →
    * purchase within 1 hour of the first view; users per depth. */
  val qFunnel: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts").cast("timestamp")).as("us"))

    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val c = ev.filter(col("event_type") === "click").as("c")
      .join(v, "user_id")
      .filter(col("us") > col("t1") && col("us") <= col("t1") + WindowUs)
      .groupBy("user_id").agg(min("us").as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("p")
      .join(c.join(v, "user_id"), "user_id")
      .filter(col("us") > col("t2") && col("us") <= col("t1") + WindowUs)
      .groupBy("user_id").agg(min("us").as("t3"))

    v.join(c.select(col("user_id"), lit(1).as("hit2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("hit3")), Seq("user_id"), "left")
      .select((lit(1) + coalesce(col("hit2"), lit(0)) + coalesce(col("hit3"), lit(0)))
        .as("funnel_depth"))
      .groupBy("funnel_depth")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("funnel_depth")
  }

  /** retention-style: cohort users by first-activity day, report how
    * many are active again k days later (k = 0..3). */
  val qRetention: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("k", datediff(col("day"), col("cohort_day")))
      .filter(col("k").between(0, 3))
      .groupBy("cohort_day", "k")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_day", "k")
  }

  /** sequenceMatch-style: per user, the time-ordered event-initial
    * string is matched against a pattern (here: an error strictly
    * between a view and a purchase). One user-keyed aggregation; the
    * pattern check is a per-row regexp on the tiny aggregated string. */
  val qSequenceMatch: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    ev.select(col("user_id"),
      struct(col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("i")).as("e"))
      .groupBy("user_id")
      .agg(array_join(expr("transform(array_sort(collect_list(e)), x -> x.i)"), "")
        .as("seq"))
      .select(col("user_id"),
        col("seq").rlike("v[^p]*e[^v]*p").as("matched"),
        length(col("seq")).as("n_events"))
      .groupBy("matched")
      .agg(count(lit(1)).as("n_users"), sum("n_events").as("total_events"))
      .orderBy("matched")
  }

  /** sequenceCount-style: per user, how many NON-OVERLAPPING
    * view→…→purchase chains occur in time order (ClickHouse
    * `sequenceCount(pattern)` semantics: the scan resumes after each
    * completed match). Same single user-keyed aggregation as
    * [[qSequenceMatch]]; the count is a regexp scan over the tiny
    * per-user string, identical left-to-right non-overlapping semantics
    * in both engines. */
  val qSequenceCount: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    ev.select(col("user_id"),
      struct(col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("i")).as("e"))
      .groupBy("user_id")
      .agg(array_join(expr("transform(array_sort(collect_list(e)), x -> x.i)"), "")
        .as("seq"))
      .select(size(regexp_extract_all(col("seq"), lit("v[^p]*p"), lit(0)))
        .as("n_chains"))
      .groupBy("n_chains")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("n_chains")
  }

  /** The EXACT ClickHouse windowFunnel semantics through the native
    * [[graft.functions.WindowFunnelAgg]]: a chain may start at ANY
    * qualifying view (the join-chain [[qFunnel]] anchors at the
    * earliest view, which under-counts users who retry). One user-keyed
    * aggregation, per-user buffers combine map-side; the oracle proves
    * each depth with an explicit exists-a-chain join. */
  val qFunnelNative: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(expr(
        """windowFunnel(3600, ts, event_type = 'view',
          |  event_type = 'click', event_type = 'purchase')""".stripMargin)
        .as("depth"))
      .groupBy("depth")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("depth")
  }

  /** The three ClickHouse windowFunnel strictness flags, one depth per
    * mode per user in a single user-keyed aggregation. strict_order and
    * strict_dedup run with a non-binding window so the oracle can
    * replay their scan-stop rules on the per-user event string;
    * strict_increase keeps the 1-hour window and replays as the
    * exists-a-chain join with strictly increasing timestamps (exact
    * because per-user timestamps are unique in this corpus; the tie
    * cases are pinned by FunnelSpec). */
  val qFunnelModes: Q = (s, dir) => {
    graft.functions.CHFunctions.register(s)
    val conds = "ts, event_type = 'view', event_type = 'click', event_type = 'purchase'"
    Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(
        expr(s"windowFunnel(1000000000, 'strict_order', $conds)").as("d_order"),
        expr(s"windowFunnel(1000000000, 'strict_dedup', $conds)").as("d_dedup"),
        expr(s"windowFunnel(3600, 'strict_increase', $conds)").as("d_increase"))
      .select(expr(
        """stack(3, 'strict_order', d_order, 'strict_dedup', d_dedup,
          |  'strict_increase', d_increase) AS (mode, depth)""".stripMargin))
      .groupBy("mode", "depth")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("mode", "depth")
  }

  /** sequenceNextNode-style ('forward', 'first_match'): per user, the
    * event immediately AFTER the first view→click adjacent pair in
    * time order — "what do users do right after a view-click?". Users
    * whose first chain sits at the end of their stream contribute a
    * NULL next_event (ClickHouse returns NULL there too); users with
    * no chain are excluded. Same single user-keyed aggregation as
    * [[qSequenceMatch]]; the chain scan is a per-row HOF over the tiny
    * per-user array, replayed in the oracle as a strpos on the
    * event-initial string. */
  val qSequenceNext: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    ev.select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type").as("t")).as("e"))
      .groupBy("user_id")
      .agg(expr("transform(array_sort(collect_list(e)), x -> x.t)").as("arr"))
      .select(col("arr"), expr(
        """CASE WHEN size(arr) < 2 THEN array()
          |ELSE filter(sequence(1, size(arr) - 1),
          |  i -> element_at(arr, i) = 'view' AND element_at(arr, i + 1) = 'click')
          |END""".stripMargin).as("cand"))
      .filter(size(col("cand")) > 0)
      .select(when(expr("element_at(cand, 1) + 2") <= size(col("arr")),
        expr("element_at(arr, element_at(cand, 1) + 2)")).as("next_event"))
      .groupBy("next_event")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("next_event").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_funnel" -> qFunnel,
    "q_funnel_native" -> qFunnelNative,
    "q_funnel_modes" -> qFunnelModes,
    "q_retention" -> qRetention,
    "q_sequence_match" -> qSequenceMatch,
    "q_sequence_count" -> qSequenceCount,
    "q_sequence_next" -> qSequenceNext)

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |v AS (SELECT user_id, min(us) AS t1 FROM ev
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND us > t1 AND us <= t1 + $WindowUs
         |      GROUP BY ev.user_id),
         |p AS (SELECT ev.user_id, min(us) AS t3
         |      FROM ev JOIN c USING (user_id) JOIN v USING (user_id)
         |      WHERE event_type = 'purchase' AND us > t2 AND us <= t1 + $WindowUs
         |      GROUP BY ev.user_id)
         |SELECT 1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS funnel_depth,
         |  count(*) AS n_users
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel_native" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
         |d1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
         |d2 AS (
         |  SELECT DISTINCT v.user_id FROM e v
         |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
         |    AND c.us >= v.us AND c.us - v.us <= $WindowUs
         |  WHERE v.event_type = 'view'),
         |d3 AS (
         |  SELECT DISTINCT v.user_id FROM e v
         |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
         |    AND c.us >= v.us AND c.us - v.us <= $WindowUs
         |  JOIN e p ON p.user_id = v.user_id AND p.event_type = 'purchase'
         |    AND p.us >= c.us AND p.us - v.us <= $WindowUs
         |  WHERE v.event_type = 'view'),
         |du AS (
         |  SELECT user_id,
         |    CASE WHEN user_id IN (SELECT user_id FROM d3) THEN 3
         |         WHEN user_id IN (SELECT user_id FROM d2) THEN 2
         |         WHEN user_id IN (SELECT user_id FROM d1) THEN 1
         |         ELSE 0 END AS depth
         |  FROM (SELECT DISTINCT user_id FROM e))
         |SELECT depth, count(*) AS n_users FROM du
         |GROUP BY depth ORDER BY depth""".stripMargin,
    // each mode's depth is replayed independently: the two scan-stop
    // modes on the per-user ordered event-initial string (foreign
    // events spelled 'x'; windows don't bind), strict_increase as the
    // strictly-increasing exists-a-chain join under the 1-hour window
    "q_funnel_modes" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |         WHEN 'purchase' THEN 'p' ELSE 'x' END AS ch,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |         WHEN 'purchase' THEN 2 ELSE -1 END AS idx
        |  FROM events),
        |seqs AS (
        |  SELECT user_id, string_agg(ch, '' ORDER BY us, idx) AS seq
        |  FROM e GROUP BY user_id),
        |-- strict_order: the scan freezes at the first foreign event
        |-- after the first view; before that, stages chain freely
        |ord AS (
        |  SELECT user_id,
        |    CASE WHEN strpos(seq, 'v') = 0 THEN ''
        |         ELSE substr(seq, strpos(seq, 'v')) END AS s1
        |  FROM seqs),
        |d_order AS (
        |  SELECT user_id,
        |    CASE WHEN regexp_matches(t, 'v.*c.*p') THEN 3
        |         WHEN regexp_matches(t, 'v.*c') THEN 2
        |         WHEN len(t) > 0 THEN 1 ELSE 0 END AS depth
        |  FROM (SELECT user_id,
        |          CASE WHEN strpos(s1, 'x') > 0
        |               THEN substr(s1, 1, strpos(s1, 'x') - 1)
        |               ELSE s1 END AS t
        |        FROM ord)),
        |-- strict_dedup: scanning from the first view, a repeat of an
        |-- achieved stage stops the scan; an early purchase is inert
        |d_dedup AS (
        |  SELECT user_id,
        |    CASE WHEN regexp_matches(u2, '^vp*cp') THEN 3
        |         WHEN regexp_matches(u2, '^vp*c') THEN 2
        |         WHEN len(u2) > 0 THEN 1 ELSE 0 END AS depth
        |  FROM (SELECT user_id,
        |          CASE WHEN strpos(u, 'v') = 0 THEN ''
        |               ELSE substr(u, strpos(u, 'v')) END AS u2
        |        FROM (SELECT user_id, regexp_replace(seq, 'x', '', 'g') AS u
        |              FROM seqs))),
        |-- strict_increase: strictly increasing chain inside the window
        |i1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
        |i2 AS (
        |  SELECT DISTINCT v.user_id FROM e v
        |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
        |    AND c.us > v.us AND c.us - v.us <= 3600000000
        |  WHERE v.event_type = 'view'),
        |i3 AS (
        |  SELECT DISTINCT v.user_id FROM e v
        |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
        |    AND c.us > v.us AND c.us - v.us <= 3600000000
        |  JOIN e p ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |    AND p.us > c.us AND p.us - v.us <= 3600000000
        |  WHERE v.event_type = 'view'),
        |d_incr AS (
        |  SELECT user_id,
        |    CASE WHEN user_id IN (SELECT user_id FROM i3) THEN 3
        |         WHEN user_id IN (SELECT user_id FROM i2) THEN 2
        |         WHEN user_id IN (SELECT user_id FROM i1) THEN 1
        |         ELSE 0 END AS depth
        |  FROM (SELECT DISTINCT user_id FROM e)),
        |m AS (
        |  SELECT 'strict_order' AS mode, depth FROM d_order
        |  UNION ALL SELECT 'strict_dedup' AS mode, depth FROM d_dedup
        |  UNION ALL SELECT 'strict_increase' AS mode, depth FROM d_incr)
        |SELECT mode, depth, count(*) AS n_users
        |FROM m GROUP BY mode, depth ORDER BY mode, depth""".stripMargin,
    "q_sequence_match" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT regexp_matches(seq, 'v[^p]*e[^v]*p') AS matched,
        |  count(*) AS n_users, CAST(sum(length(seq)) AS BIGINT) AS total_events
        |FROM seqs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sequence_count" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INT) AS n_chains,
        |  count(*) AS n_users
        |FROM seqs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |  CAST(datediff('day', cohort_day, day) AS INT) AS k,
        |  count(DISTINCT ev.user_id) AS n_active
        |FROM ev JOIN cohort USING (user_id)
        |WHERE datediff('day', cohort_day, day) BETWEEN 0 AND 3
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // first adjacent view→click pair via strpos on the event-initial
    // string; the char AFTER it decodes back to the event name (''
    // past the end → NULL, same as the Spark side's missing follower)
    "q_sequence_next" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id),
        |m AS (SELECT user_id, strpos(seq, 'vc') AS pos, seq
        |      FROM seqs WHERE strpos(seq, 'vc') > 0)
        |SELECT CASE substr(seq, pos + 2, 1)
        |         WHEN 'v' THEN 'view' WHEN 'c' THEN 'click'
        |         WHEN 'p' THEN 'purchase' WHEN 'e' THEN 'error'
        |         WHEN 's' THEN 'signup' END AS next_event,
        |  count(*) AS n_users
        |FROM m GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)
}
