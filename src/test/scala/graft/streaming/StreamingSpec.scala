package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  /** Replay the batch events table as a file stream into a memory sink
    * and compare with the batch answer. */
  test("windowed counts over a replayed stream match the batch result") {
    val batch = graft.Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_stream").toString
    batch.write.mode("overwrite").parquet(dir)

    val stream = EventStreams.fileStream(spark, dir, batch)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_counts")
      .orderBy("window_start", "event_type").collect()
    val want = graft.operators.Events.evWindowed(spark, sf)
      .select("window_start", "event_type", "n_events", "sum_value").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) == w.getTimestamp(0))
      assert(g.getString(1) == w.getString(1))
      assert(g.getLong(2) == w.getLong(2))
    }
  }

  test("round-7 imperative aggregates run under streaming state merge") {
    // TypedImperativeAggregates must serialize into the state store and
    // merge across micro-batches: replay events as a stream, fold
    // cramersV + groupBitmapXor + sumKahan per event_type, compare to
    // the identical batch aggregation
    graft.functions.CHFunctions.register(spark)
    val batch = graft.Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_stream_agg").toString
    batch.write.mode("overwrite").parquet(dir)
    val agg =
      """SELECT event_type,
        |  round(cramersV(pmod(user_id, 5), pmod(event_id, 3)), 9) AS v,
        |  groupBitmapXor(bitmapBuild(array(pmod(user_id, 64)))) AS bx,
        |  round(sumKahan(value), 6) AS sk
        |FROM src GROUP BY event_type""".stripMargin
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    stream.createOrReplaceTempView("src")
    val q = spark.sql(agg)
      .writeStream.format("memory").queryName("r7_aggs")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("r7_aggs").orderBy("event_type").collect()
    batch.createOrReplaceTempView("src")
    val want = spark.sql(agg).orderBy("event_type").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"\n$g\n$w") }
  }

  test("streaming user activity + read-side top-k matches the batch leaderboard") {
    val batch = graft.Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_topu").toString
    batch.write.mode("overwrite").parquet(dir)

    val stream = EventStreams.fileStream(spark, dir, batch)
    val q = EventStreams.userActivity(stream)
      .writeStream.format("memory").queryName("user_act")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = EventStreams.topOfWindows(spark.table("user_act"), 3)
      .orderBy("window_start", "rn").collect()
    val want = graft.operators.Events.evTopUsers(spark, sf).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("native session_window over a replayed stream matches the batch query") {
    val batch = graft.Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_swin").toString
    batch.write.mode("overwrite").parquet(dir)

    val stream = EventStreams.fileStream(spark, dir, batch)
    val q = EventStreams.sessionWindows(stream)
      .writeStream.format("memory").queryName("swin_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("swin_out")
      .orderBy("user_id", "session_start").collect()
    val want = graft.operators.Events.evSessionsNative(spark, sf).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getTimestamp(1) == w.getTimestamp(1))
      assert(g.getTimestamp(2) == w.getTimestamp(2))
      assert(g.getLong(3) == w.getLong(3))
    }
  }

  test("flatMapGroupsWithState sessionization matches batch session count") {
    import spark.implicits._
    val events = Seq(
      // user 1: two sessions split by a 40-minute gap
      EventStreams.Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 1.0),
      EventStreams.Event(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "a", 2.0),
      EventStreams.Event(3, Timestamp.valueOf("2024-01-01 10:50:00"), 1, "a", 3.0),
      // user 2: one session
      EventStreams.Event(4, Timestamp.valueOf("2024-01-01 09:00:00"), 2, "b", 4.0))
      .toDS()

    // batch Dataset through the same state function: run as a single
    // micro-batch via a memory stream
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    input.addData(events.collect().toSeq)
    val q = EventStreams.sessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance event time far enough that all sessions time out
      input.addData(EventStreams.Event(99,
        Timestamp.valueOf("2024-01-02 10:00:00"), 99, "z", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val sessions = spark.table("sessions_out").as[EventStreams.Session]
      .collect().filter(_.user_id != 99)
    assert(sessions.count(_.user_id == 1) == 2)
    assert(sessions.count(_.user_id == 2) == 1)
    val first = sessions.filter(_.user_id == 1)
      .minBy(_.session_start.getTime)
    assert(first.n_events == 2 && first.session_value == 3.0)
  }

  test("streaming as-of enrichment picks the latest at-or-before state") {
    import spark.implicits._
    val ev = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    val up = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Update](
      spark)
    // batch 1 (added BEFORE start, so both sources land in the first
    // micro-batch): interleaved updates and events for key 1; an
    // event BEFORE any update stays unenriched; an update at the
    // exact event ts applies (at-or-before)
    up.addData(
      EventStreams.Update(1, Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
      EventStreams.Update(1, Timestamp.valueOf("2024-01-01 10:30:00"), 20.0))
    ev.addData(
      EventStreams.Event(1, Timestamp.valueOf("2024-01-01 09:59:00"), 1, "a", 0.0),
      EventStreams.Event(2, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 0.0),
      EventStreams.Event(3, Timestamp.valueOf("2024-01-01 10:15:00"), 1, "a", 0.0),
      EventStreams.Event(4, Timestamp.valueOf("2024-01-01 10:45:00"), 1, "a", 0.0))
    val q = EventStreams.asofEnrich(ev.toDS(), up.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: state carries across micro-batches (no new updates)
      ev.addData(
        EventStreams.Event(5, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "a", 0.0),
        EventStreams.Event(6, Timestamp.valueOf("2024-01-01 11:00:00"), 2, "a", 0.0))
      q.processAllAvailable()
      val rows = spark.table("asof_out").as[EventStreams.Enriched]
        .collect().sortBy(_.event_id)
      assert(rows.map(_.state_v).toSeq ==
        Seq(None, Some(10.0), Some(10.0), Some(20.0), Some(20.0), None))
    } finally q.stop()
  }

  test("EXACT as-of enrichment holds events for the watermark and " +
    "matches the batch operator on replayed history") {
    import spark.implicits._
    val ev = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    val up = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Update](
      spark)
    val q = EventStreams.asofEnrichExact(ev.toDS(), up.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("asof_exact_out")
      .outputMode("append").start()
    try {
      // b1: two updates, including one with a FUTURE timestamp (09:45)
      // relative to the event that arrives later — the inexact variant
      // would enrich that event with it; the exact one must not
      up.addData(
        EventStreams.Update(1, Timestamp.valueOf("2024-01-01 09:00:00"), 10.0),
        EventStreams.Update(1, Timestamp.valueOf("2024-01-01 09:45:00"), 99.0))
      q.processAllAvailable()
      // b2: the event (09:40) arrives AFTER the 09:45 update — held in
      // state (watermark 09:35 has not passed it), nothing emitted
      ev.addData(EventStreams.Event(1,
        Timestamp.valueOf("2024-01-01 09:40:00"), 1, "a", 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_exact_out").count() == 0)
      // b3: a LATE update (09:38, inside the allowed lateness) that is
      // the event's true at-or-before match arrives in a LATER batch
      // than the event — exact replay must still pick it up
      up.addData(EventStreams.Update(1,
        Timestamp.valueOf("2024-01-01 09:38:00"), 77.0))
      q.processAllAvailable()
      // b4: a second key-1 event, plus key-2 rows on BOTH streams —
      // the global watermark is the MIN across the two inputs (the
      // exactness guarantee needs both), so both must advance
      ev.addData(
        EventStreams.Event(2, Timestamp.valueOf("2024-01-01 10:30:00"), 1, "a", 0.0),
        EventStreams.Event(99, Timestamp.valueOf("2024-01-01 10:30:00"), 2, "wm", 0.0))
      up.addData(EventStreams.Update(2,
        Timestamp.valueOf("2024-01-01 10:30:00"), 0.0))
      q.processAllAvailable()
      // b5/b6: watermark advances fire the event-time timeouts; key 1
      // flushes event 1 (exact match: the late 09:38 update), then
      // event 2 (09:45 — collapsed into the floor by pruning)
      ev.addData(EventStreams.Event(3,
        Timestamp.valueOf("2024-01-01 10:50:00"), 2, "wm", 0.0))
      up.addData(EventStreams.Update(2,
        Timestamp.valueOf("2024-01-01 10:50:00"), 0.0))
      q.processAllAvailable()
      ev.addData(EventStreams.Event(4,
        Timestamp.valueOf("2024-01-01 11:30:00"), 2, "wm", 0.0))
      up.addData(EventStreams.Update(2,
        Timestamp.valueOf("2024-01-01 11:30:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("asof_exact_out").as[EventStreams.Enriched]
        .collect().filter(_.user_id == 1).sortBy(_.event_id)
      assert(rows.map(_.event_id).toSeq == Seq(1L, 2L))
      assert(rows.map(_.state_v).toSeq == Seq(Some(77.0), Some(99.0)))
      assert(rows.head.state_ts.map(_.toString)
        .contains("2024-01-01 09:38:00.0"))
      // batch-equals-stream: the batch AsOf operator over the SAME
      // replayed fixture returns the same enrichment per event
      val bEv = Seq(
        (1L, Timestamp.valueOf("2024-01-01 09:40:00"), 1L),
        (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L))
        .toDF("event_id", "ts", "user_id")
      val bUp = Seq(
        (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 10.0),
        (1L, Timestamp.valueOf("2024-01-01 09:45:00"), 99.0),
        (1L, Timestamp.valueOf("2024-01-01 09:38:00"), 77.0))
        .toDF("key", "uts", "v")
      val batch = graft.plans.AsOf.join(bEv, bUp,
        key = ("user_id", "key"), time = ("ts", "uts"),
        forward = false, strict = false)
        .select("event_id", "r_v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows.map(e => e.event_id -> e.state_v.get).toMap == batch)
    } finally q.stop()
  }

  test("EXACT as-of floor-only state evicts after floorTtl; a later " +
    "event enriches null") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    val up = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Update](
      spark)
    val q = EventStreams.asofEnrichExact(ev.toDS(), up.toDS(),
      "10 minutes", floorTtl = "1 hour")
      .writeStream.format("memory").queryName("asof_exact_ttl")
      .outputMode("append").start()
    try {
      def drive(t: String): Unit = {
        // key-2 traffic on BOTH streams advances the global watermark
        up.addData(EventStreams.Update(2, ts(t), 0.0))
        ev.addData(EventStreams.Event(900 + ts(t).getMinutes,
          ts(t), 2, "wm", 0.0))
        q.processAllAvailable()
      }
      // key-1 update, then quiet: collapses to a floor row
      up.addData(EventStreams.Update(1, ts("2024-01-01 09:00:00"), 5.0))
      drive("2024-01-01 09:00:00")
      drive("2024-01-01 09:30:00") // wm 09:20 → update collapses to floor
      drive("2024-01-01 11:00:00") // TTL armed at ~10:20, wm 10:50
      drive("2024-01-01 11:30:00") // TTL fires: retired key 1 evicts
      // a key-1 event AFTER the TTL horizon: the floor is gone, so it
      // must enrich as null (the documented trade-off), not 5.0
      ev.addData(EventStreams.Event(1, ts("2024-01-01 11:40:00"), 1, "a", 0.0))
      drive("2024-01-01 12:30:00")
      drive("2024-01-01 13:00:00") // ripeness flush
      val rows = spark.table("asof_exact_ttl").as[EventStreams.Enriched]
        .collect().filter(_.user_id == 1)
      assert(rows.map(_.event_id).toSeq == Seq(1L))
      assert(rows.head.state_v.isEmpty && rows.head.state_ts.isEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events within the watermark") {
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    val q = EventStreams.dedupedStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val e1 = EventStreams.Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 1.0)
      val e2 = EventStreams.Event(2, Timestamp.valueOf("2024-01-01 10:01:00"), 1, "a", 2.0)
      input.addData(e1, e2, e1) // duplicate within batch
      q.processAllAvailable()
      input.addData(e1) // replay across batches
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming near-dup drops same-SimHash docs and evicts state past watermark") {
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Doc](
      spark)
    val q = EventStreams.nearDupStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData(
        EventStreams.Doc(1, Timestamp.valueOf("2024-01-01 10:00:00"), "spark table scan fast"),
        EventStreams.Doc(2, Timestamp.valueOf("2024-01-01 10:05:00"), "Spark  table scan FAST"), // same tokens post-normalize
        EventStreams.Doc(3, Timestamp.valueOf("2024-01-01 10:01:00"), "totally different words here"))
      q.processAllAvailable()
      // doc 2 hashes identically to doc 1 -> dropped
      assert(spark.table("neardup_out").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      // advance the watermark far past the signatures, then replay doc 1's
      // text: old state must be evicted, so it is admitted again
      input.addData(
        EventStreams.Doc(4, Timestamp.valueOf("2024-01-01 14:00:00"), "watermark advancer"))
      q.processAllAvailable()
      input.addData(
        EventStreams.Doc(5, Timestamp.valueOf("2024-01-01 13:50:00"), "spark table scan fast"))
      q.processAllAvailable()
      assert(spark.table("neardup_out").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("materialized view maintains mergeable state parts incrementally") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables(spark, sf, "events")
    val srcDir = Files.createTempDirectory("graft_mv_src").toString
    val mvDir = Files.createTempDirectory("graft_mv").toString + "/view"
    val ckpt = Files.createTempDirectory("graft_mv_ck").toString
    // several source files -> several micro-batches -> several parts
    events.repartition(8).write.mode("overwrite").parquet(srcDir)

    val q = MaterializedView.maintain(spark, srcDir, events, mvDir, ckpt,
      maxFilesPerTrigger = 2)
    try q.processAllAvailable() finally q.stop()

    // incremental: multiple parts were appended, and the stored view is
    // tiny relative to the source (parts x groups, not raw rows)
    val parts = spark.read.parquet(mvDir)
    assert(parts.select("part_id").distinct().count() > 1)
    assert(parts.count() < events.count() / 10)

    // merged figures match the batch aggregate over ALL raw rows:
    // exact for count/sum, sketch-accurate for distinct and median
    val got = MaterializedView.read(spark, mvDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val want = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("u"), count(lit(1)).as("n"),
        round(sum("value"), 2).as("sv"),
        expr("percentile(value, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (tpe, g) =>
      val w = want(tpe)
      assert(g.getLong(3) == w.getLong(2), s"$tpe n_events")
      assert(g.getDouble(4) == w.getDouble(3), s"$tpe sum_value")
      val (au, eu) = (g.getLong(1).toDouble, w.getLong(1).toDouble)
      assert(math.abs(au - eu) / eu < 0.05, s"$tpe approx_users $au vs $eu")
      val (am, em) = (g.getDouble(2), w.getDouble(4))
      assert(math.abs(am - em) <= math.abs(em) * 0.05 + 1.0, s"$tpe median")
    }

    // restartability: a fresh maintain run over the same checkpoint
    // sees nothing new and appends no parts
    val before = spark.read.parquet(mvDir).count()
    val q2 = MaterializedView.maintain(spark, srcDir, events, mvDir, ckpt,
      maxFilesPerTrigger = 2)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(mvDir).count() == before)

    // replay idempotence: foreachBatch is at-least-once, so a batch
    // whose write landed but whose checkpoint commit didn't will run
    // again — rewriting its partition must replace, not duplicate
    val p0 = spark.read.parquet(mvDir).filter(col("part_id") === 0)
    val replay = spark.createDataFrame(
      spark.sparkContext.parallelize(p0.collect().toSeq), p0.schema)
    replay.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part_id").parquet(mvDir)
    assert(spark.read.parquet(mvDir).count() == before)
  }

  test("quantile sketch states build incrementally over a stream") {
    import spark.implicits._
    graft.functions.CHFunctions.register(spark)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    // per-type sketch states maintained incrementally (complete mode)...
    val q = input.toDS().toDF()
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.expr("quantileState(value)").as("st"))
      .writeStream.format("memory").queryName("q_states")
      .outputMode("complete").start()
    try {
      input.addData((1 to 50).map(i =>
        EventStreams.Event(i.toLong, Timestamp.valueOf("2024-01-01 10:00:00"),
          1, "view", i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((51 to 100).map(i =>
        EventStreams.Event(i.toLong, Timestamp.valueOf("2024-01-01 10:01:00"),
          1, "view", i.toDouble)): _*)
      q.processAllAvailable()
      // ...then read off the merged quantile WITHOUT touching raw rows
      val med = spark.sql(
        "SELECT quantileMerge(st, 0.5) FROM q_states").head.getDouble(0)
      assert(med >= 45 && med <= 55, s"median over streamed 1..100 was $med")
    } finally q.stop()
  }

  test("stream-stream interval join matches pairs and bounds state") {
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event](
      spark)
    val q = EventStreams.errorContextJoin(input.toDS().toDF())
      .writeStream.format("memory").queryName("err_ctx")
      .outputMode("append").start()
    try {
      input.addData(
        EventStreams.Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 0),
        EventStreams.Event(2, Timestamp.valueOf("2024-01-01 10:03:00"), 1, "error", 0),
        EventStreams.Event(3, Timestamp.valueOf("2024-01-01 09:00:00"), 1, "view", 0), // too old
        EventStreams.Event(4, Timestamp.valueOf("2024-01-01 10:04:00"), 2, "view", 0), // other user
        EventStreams.Event(6, Timestamp.valueOf("2024-01-01 10:06:00"), 1, "view", 0)) // after error, in +5m
      q.processAllAvailable()
      // advance the watermark far past the interval so join state drains
      input.addData(
        EventStreams.Event(5, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "view", 0))
      q.processAllAvailable()
      val got = spark.table("err_ctx")
        .select("error_id", "user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      // the ±5 min window matches the views at 10:00 (before) and 10:06 (after)
      assert(got.toSeq.sorted == Seq((2L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension") {
    val batch = graft.Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_enrich").toString
    batch.write.mode("overwrite").parquet(dir)

    val users = spark.range(0, 100).toDF("user_id")
      .withColumn("tier", when(col("user_id") % 2 === 0, "even").otherwise("odd"))

    val stream = EventStreams.fileStream(spark, dir, batch)
    val q = EventStreams.enriched(stream, users)
      .groupBy("tier").count()
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("enriched_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("even", "odd"))
    assert(got.values.sum == batch.count())
  }
}
