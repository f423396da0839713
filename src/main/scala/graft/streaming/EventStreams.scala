package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analytics over the `events` shape (SURVEY §2
  * E1-E3). The batch-equivalent formulations (verified against the
  * DuckDB oracle) live in [[graft.operators.Events]]; these are the
  * incremental versions a 24/7 pipeline runs.
  *
  * Scale notes: state is keyed (window×type / user) so it partitions
  * across executors; watermarks bound state size; the enrichment join
  * broadcasts the static dimension — no stream-side shuffle.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, session_value: Double)

  /** E1: tumbling 1-hour windowed counts with a watermark bounding
    * late data (and therefore state retention). */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), graft.operators.ExactAgg.sumExact(col("value"), 100L, 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** E1b: HOPPING (sliding) windowed counts — each event contributes
    * to duration/slide overlapping windows (4 here). Same mergeable
    * windowed aggregate as the tumbling form: Spark's window generator
    * emits the per-event window rows map-side, so the shuffle carries
    * partially-aggregated (window, type) groups, not events x 4. */
  def hoppingCounts(events: DataFrame, duration: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), graft.operators.ExactAgg.sumExact(col("value"), 100L, 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** E9: streaming heavy hitters, maintenance side — per-window
    * per-user activity counts as a fully mergeable windowed aggregate
    * (partial combine map-side, watermark-evicted state). The top-k
    * rank runs READ-SIDE over the materialized counts
    * ([[topOfWindows]]) — the standard leaderboard split: the stream
    * maintains O(windows × active users) counts and never ranks;
    * ranking inside the stream would force a non-mergeable global
    * order per trigger. */
  def userActivity(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), graft.operators.ExactAgg.sumExact(col("value"), 100L, 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** E9 read-side finisher: top-k users per window from the maintained
    * counts — ranks the tiny sink table, not the event stream. */
  def topOfWindows(activity: DataFrame, k: Int = 3): DataFrame =
    activity
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window_start")
          .orderBy(col("n_events").desc, col("user_id"))))
      .filter(col("rn") <= k)

  /** E2: gap-based sessionization via flatMapGroupsWithState — emits a
    * session when 30 minutes pass with no event for the user. Events
    * within a micro-batch are sorted; cross-batch order is handled by
    * the state's running end timestamp. */
  def sessions(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = Seq.newBuilder[Session]
          for (e <- sorted) {
            cur match {
              case Some(s) if e.ts.getTime - s.endMs > gapMs =>
                out += Session(userId, new Timestamp(s.startMs),
                  new Timestamp(s.endMs), s.n, math.round(s.sum * 100) / 100.0)
                cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
              case Some(s) =>
                cur = Some(SessionState(s.startMs,
                  math.max(s.endMs, e.ts.getTime), s.n + 1, s.sum + e.value))
              case None =>
                cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
            }
          }
          cur match {
            case Some(s) if state.hasTimedOut =>
              out += Session(userId, new Timestamp(s.startMs),
                new Timestamp(s.endMs), s.n, math.round(s.sum * 100) / 100.0)
              state.remove()
            case Some(s) =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            case None => if (state.hasTimedOut) state.remove()
          }
          out.result().iterator
      }
  }

  final case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)

  /** A right-side state update for [[asofEnrich]] (e.g. a quote, a
    * config version): the latest one at-or-before an event's ts is the
    * enrichment value. */
  final case class Update(key: Long, ts: Timestamp, v: Double)

  final case class Enriched(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double, state_ts: Option[Timestamp], state_v: Option[Double])

  // public: Spark's generated (de)serializers cannot access private
  // classes
  final case class AsOfTagged(
      key: Long, ts: Timestamp, isUpdate: Boolean,
      event: Option[Event], upd: Option[Double])

  final case class LatestState(tsMs: Long, v: Double)

  /** E10: streaming AS-OF enrichment — the incremental twin of the
    * batch [[graft.plans.AsOf]] operator: each event picks up the
    * LATEST update at-or-before its timestamp for its key (latest
    * quote before the trade, config version in force at the event).
    *
    * Shape: both streams union into one keyed stream, and
    * flatMapGroupsWithState keeps exactly ONE row of state per key
    * (the latest update) — state is O(keys), not O(history), so it
    * needs no watermark eviction to stay bounded. Within a
    * micro-batch rows process in (ts, updates-first) order, so an
    * update and an event at the same timestamp enrich at-or-before,
    * matching the batch operator's backward mode.
    *
    * Documented departure from the exact batch join: state holds only
    * the latest update, so an event arriving in a LATER micro-batch
    * than an update with a larger timestamp enriches with that newer
    * state (the standard CDC-enrichment semantic). The batch operator
    * is the exact-replay twin for backfills. */
  def asofEnrich(events: Dataset[Event], updates: Dataset[Update])
      : Dataset[Enriched] = {
    import events.sparkSession.implicits._
    val l = events.map(e =>
      AsOfTagged(e.user_id, e.ts, isUpdate = false, Some(e), None))
    val r = updates.map(u =>
      AsOfTagged(u.key, u.ts, isUpdate = true, None, Some(u.v)))
    l.unionByName(r)
      .groupByKey(_.key)
      .flatMapGroupsWithState[LatestState, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[AsOfTagged], state: GroupState[LatestState]) =>
          // updates sort before events at the same ts: at-or-before
          val sorted = batch.toSeq.sortBy(t => (t.ts.getTime, !t.isUpdate))
          var cur = state.getOption
          val out = Seq.newBuilder[Enriched]
          for (t <- sorted) {
            if (t.isUpdate) {
              if (cur.forall(_.tsMs <= t.ts.getTime))
                cur = Some(LatestState(t.ts.getTime, t.upd.get))
            } else {
              val e = t.event.get
              out += Enriched(e.event_id, e.ts, e.user_id, e.event_type,
                e.value, cur.map(s => new Timestamp(s.tsMs)), cur.map(_.v))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Per-key state for [[asofEnrichExact]]: events buffered until the
    * watermark passes them, updates kept while a future event could
    * still need them, and the single latest pre-watermark update as
    * the collapsed floor. */
  final case class AsOfExactState(
      floorTs: Long, floorV: Double, hasFloor: Boolean,
      updates: Seq[(Long, Double)], buffered: Seq[Event])

  /** E10b: EXACT-replay streaming as-of enrichment — the
    * watermark-buffered twin of [[asofEnrich]] that removes its
    * documented cross-batch departure: an event is held in state until
    * the watermark passes its timestamp, then emitted with the TRUE
    * at-or-before update — even when a newer (future-timestamped)
    * update arrived in an earlier micro-batch, and even when the
    * at-or-before update arrives in a LATER micro-batch than the
    * event (within the allowed lateness). Replaying history through
    * this stream therefore equals the batch [[graft.plans.AsOf]]
    * operator on the same data.
    *
    * Cost of exactness: per-key state is O(events + updates inside
    * the watermark horizon) instead of [[asofEnrich]]'s O(1) — the
    * horizon (`delay`) bounds it, and each flush collapses every
    * pre-watermark update into a single floor row. Emission waits
    * one horizon behind the stream head (the price of knowing no
    * earlier update can still arrive); an event-time timeout flushes
    * ripe events even when a key goes quiet.
    *
    * The O-bound above covers rows inside the horizon; a key that
    * goes QUIET would otherwise keep its collapsed floor row forever
    * (unbounded floor count across churned keys in a long-running
    * stream), so floor-only state evicts `floorTtl` of event time
    * after the key's last activity. Trade-off, documented: an event
    * for a retired key arriving later than `floorTtl` enriches as
    * null instead of the evicted floor — size the TTL to the
    * longest plausible key silence. */
  def asofEnrichExact(events: Dataset[Event], updates: Dataset[Update],
      delay: String = "10 minutes",
      floorTtl: String = "30 days"): Dataset[Enriched] = {
    val ttlMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(floorTtl))
      require(iv.months == 0,
        "floorTtl must be a fixed-length interval (days or smaller)")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    require(ttlMs > 0, "floorTtl must be positive")
    import events.sparkSession.implicits._
    // the watermark goes ON the tagged stream (a map() re-derives its
    // output attributes, which would drop a watermark set upstream)
    val l = events.map(e =>
      AsOfTagged(e.user_id, e.ts, isUpdate = false, Some(e), None))
      .withWatermark("ts", delay)
    val r = updates.map(u =>
      AsOfTagged(u.key, u.ts, isUpdate = true, None, Some(u.v)))
      .withWatermark("ts", delay)
    l.unionByName(r)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfExactState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, batch: Iterator[AsOfTagged],
            state: GroupState[AsOfExactState]) =>
          val st0 = state.getOption
            .getOrElse(AsOfExactState(0L, 0.0, hasFloor = false, Nil, Nil))
          var ups = st0.updates
          var buf = st0.buffered
          var floor: Option[(Long, Double)] =
            if (st0.hasFloor) Some((st0.floorTs, st0.floorV)) else None
          for (t <- batch) {
            if (t.isUpdate) ups :+= ((t.ts.getTime, t.upd.get))
            else buf :+= t.event.get
          }
          val wm = state.getCurrentWatermarkMs()
          val sortedUps = ups.sortBy(_._1)
          def lookup(ts: Long): Option[(Long, Double)] = {
            val inHistory = sortedUps.takeWhile(_._1 <= ts).lastOption
            inHistory.orElse(floor.filter(_._1 <= ts))
          }
          // events at-or-before the watermark are RIPE: every update
          // they could match has arrived (later ones would be dropped
          // as late data) — emit them with the exact lookup
          val (ripe, hold) = buf.partition(_.ts.getTime <= wm)
          val out = ripe.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val s = lookup(e.ts.getTime)
            Enriched(e.event_id, e.ts, e.user_id, e.event_type, e.value,
              s.map(x => new Timestamp(x._1)), s.map(_._2))
          }
          // collapse pre-watermark updates into the single floor row
          // (any future event has ts > wm, so only the LATEST of them
          // can ever match again)
          val (old, live) = sortedUps.partition(_._1 <= wm)
          floor = (floor.toSeq ++ old).sortBy(_._1).lastOption
          // a TTL wake with nothing left but the floor = the key is
          // retired — drop the state instead of re-arming forever
          val retiredNow = state.hasTimedOut && buf.isEmpty &&
            ups.isEmpty && hold.isEmpty && live.isEmpty
          if (hold.isEmpty && live.isEmpty &&
            (floor.isEmpty || retiredNow)) state.remove()
          else {
            state.update(AsOfExactState(
              floor.map(_._1).getOrElse(0L), floor.map(_._2).getOrElse(0.0),
              floor.nonEmpty, live, hold))
            // wake when the watermark passes the oldest held row, so
            // quiet keys still flush and prune; floor-only state arms
            // the retirement TTL instead (evict quiet keys)
            val next =
              if (hold.nonEmpty) Some(hold.map(_.ts.getTime).min + 1)
              else if (live.nonEmpty) Some(live.map(_._1).min + 1)
              else Some(math.max(wm, floor.map(_._1).getOrElse(0L)) + ttlMs)
            next.foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
  }

  /** E2b: gap-based sessionization via Spark's NATIVE session_window —
    * the declarative twin of [[sessions]]: no user state code, and the
    * planner gets a mergeable session aggregate (partial sessions merge
    * map-side, then once after the user_id shuffle; watermark evicts
    * closed sessions in streaming). Semantics note: a session window is
    * `[first, last + gap)`, so an event at EXACTLY last + gap starts a
    * new session — the verified batch query `ev_sessions_native`
    * replays that boundary rule in its oracle. Works unchanged over a
    * batch DataFrame (the watermark is a no-op there). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), graft.operators.ExactAgg.sumExact(col("value"), 100L, 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** E4: streaming exact dedup — drops replayed/duplicated events by
    * id, keeping state only within the watermark horizon (the
    * at-least-once → exactly-once repair step of an ingest pipeline). */
  def dedupedStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** E3: stream enriched by a static dimension — broadcast hash join,
    * no state, no stream shuffle. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** E5: stream-stream interval join with watermarks — each `error`
    * event joined to the same user's `view` events within ±5 minutes,
    * matching the batch twin [[graft.operators.Events.evErrorContext]].
    * The event-time range condition is what lets Structured Streaming
    * bound BOTH join states (it can drop buffered rows past the
    * watermark + interval), so state stays finite on an unbounded
    * stream; without the range bound a stream-stream join must buffer
    * forever. */
  def errorContextJoin(events: DataFrame): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    errors.join(views,
      expr("""user_id = v_user AND
             |v_ts BETWEEN e_ts - INTERVAL 5 MINUTES
             |      AND e_ts + INTERVAL 5 MINUTES""".stripMargin))
      .select(col("user_id"), col("error_id"), col("e_ts"), col("v_ts"))
  }

  /** E7: streaming NEAR-dup — the incremental twin of the batch
    * SimHash dedup (SURVEY §2 D3): each arriving document's 60-bit
    * SimHash (native codegen'd expression, order-insensitive token
    * votes) is the dedup key, so rewordings that hash identically are
    * dropped, not just byte-identical repeats. State is the set of
    * signatures inside the watermark — keyed state that partitions
    * across executors and is EVICTED as the watermark advances, which
    * is what makes always-on ingest dedup feasible: the batch LSH
    * pipeline would need the full history every run. */
  def nearDupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    graft.functions.CHFunctions.register(docs.sparkSession)
    docs
      .withColumn("sig", expr(
        "simHash(split(regexp_replace(trim(lower(text)), ' +', ' '), ' '))"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig")
  }

  /** File-source → memory-sink harness used by the specs and by any
    * caller that wants the batch tables replayed as a stream. */
  def fileStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
}
