package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ClickHouse MATERIALIZED VIEW → AggregatingMergeTree pattern on
  * Structured Streaming (SURVEY §2 E8): an insert-triggered aggregation
  * that stores mergeable STATE, not final values, so the read side can
  * re-aggregate at any granularity without rescanning raw rows.
  *
  * Writer: each micro-batch partially aggregates ONLY its new rows to
  * one state row per group — `uniqState` (HLL) + `quantileState` (GK
  * summary) + plain count/sum — and APPENDS them to the view directory
  * as a new "part", exactly how a CH materialized view writes one part
  * per insert block. Refresh cost is O(new data); the source is never
  * rescanned, and the checkpoint makes maintenance restartable
  * exactly-once.
  *
  * Reader: `uniqMerge`/`quantileMerge`/`sum` over the stored parts —
  * a scan of (parts × groups) state rows regardless of how many
  * billions of raw rows produced them. That asymmetry is the entire
  * point of the pattern at 100 TB: the expensive scan happened once,
  * incrementally, at ingest time.
  */
object MaterializedView {

  /** Start incremental maintenance of the per-event-type view over a
    * parquet source directory. */
  def maintain(spark: SparkSession, sourceDir: String, schemaFrom: DataFrame,
      mvDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 4): StreamingQuery = {
    graft.functions.CHFunctions.register(spark)
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch is at-least-once: a crash between this write and
        // the checkpoint commit REPLAYS the batch. Writing each batch
        // as its own partition with dynamic-partition overwrite makes
        // the replay idempotent (part_id=N replaces part_id=N, never
        // duplicates it), which is what upgrades the pipeline to
        // exactly-once results.
        batch.groupBy(col("event_type"))
          .agg(expr("uniqState(user_id)").as("ust"),
            expr("quantileState(value)").as("qst"),
            count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sv"))  // exact cents: part-merge order independent
          .withColumn("part_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("part_id")
          .parquet(mvDir)
      }
      .start()
  }

  /** Merge the stored parts up to final per-event-type figures. */
  def read(spark: SparkSession, mvDir: String): DataFrame = {
    graft.functions.CHFunctions.register(spark)
    spark.read.parquet(mvDir)
      .groupBy("event_type")
      .agg(expr("uniqMerge(ust)").as("approx_users"),
        expr("quantileMerge(qst, 0.5)").as("median_value"),
        sum("n").as("n_events"),
        (sum("sv") / lit(100.0)).as("sum_value"))
      .orderBy("event_type")
  }
}
