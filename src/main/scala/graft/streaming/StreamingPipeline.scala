package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.TopK

/** The reference's active streaming dataflow (SURVEY EP2) on
  * Structured Streaming:
  *
  *   source → event-time watermark (10 s out-of-orderness,
  *   TopKStreamingJob.kt:248-249) → dedup on event_id with
  *   watermark-scoped state (the Flink ValueState+TTL dedup,
  *   :87-119) → fork: raw append sink; 1-minute tumbling rollup
  *   (:311-315) → rollup sink; per-window top-K ranking → topk sink
  *   (the legacy continuous path's output tables,
  *   restaurant_topk/global_topk).
  *
  * Ranking is not incrementally maintainable, so the topk leg runs in
  * `foreachBatch` over finalized windows — each micro-batch ranks
  * only the windows it saw (SURVEY §7.4 "streaming append-mode +
  * ranking").
  *
  * State at scale: dedup state is watermark-bounded (keys older than
  * the watermark are evicted — the 1 h TTL analog); rollup state is
  * one row per (window, dims) and closes when the watermark passes
  * window end. Nothing driver-side.
  */
object StreamingPipeline {

  /** Watermarked event-time stream with derived revenue column. */
  def withEventTime(events: DataFrame, slack: String = "10 seconds"): DataFrame =
    events
      .withColumn("value_cents", round(col("value") * 100).cast("long"))
      .withWatermark("ts", slack)

  /** Streaming first-wins dedup by event_id, state scoped to the
    * watermark (D1 semantics; TTL ≈ watermark horizon).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Streaming 1-minute tumbling rollup (A1/A3 + approximate distinct
    * users — HLL++, the streaming-safe sketch).
    */
  def rollupStream(deduped: DataFrame, dims: Seq[String] = Seq("event_type")): DataFrame =
    deduped
      .groupBy((window(col("ts"), "1 minute").as("w") +: dims.map(col)): _*)
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("sum_value_cents"),
        approx_count_distinct(col("user_id")).as("unique_users_est"))
      .select(
        (unix_millis(col("w.start")).as("window_start_ms") +: dims.map(col)) ++
          Seq(col("order_count"), col("sum_value_cents"), col("unique_users_est")): _*)

  /** Rank one micro-batch of finalized rollup rows into per-window
    * top-K (K2 semantics, deterministic tie-break).
    */
  def rankBatch(rollupBatch: DataFrame, k: Int): DataFrame =
    TopK.topKPerKey(rollupBatch, Seq("window_start_ms"),
      Seq(col("order_count").desc, col("sum_value_cents").desc, col("event_type").asc), k)

  /** Idempotent micro-batch append: the batch writes (dynamically
    * overwrites) its own `batch_id=<id>` partition, so a batch
    * retried after a crash REPLACES its previous partial output
    * instead of double-appending — `foreachBatch` is at-least-once,
    * and (batchId, idempotent write) is the standard way to lift it
    * to exactly-once (the reference's 60 s-checkpoint exactly-once
    * claim, TopKStreamingJob.kt:218). Readers see `batch_id` as an
    * ordinary partition column.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** S4: JSON-encode every row (`to_json(struct(*))`) — the value
    * format the reference writes to its output topic
    * (TopKStreamingJob.kt:349-419). Pair with [[jsonSink]] or any
    * Kafka-like value sink.
    */
  def jsonEncode(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** S4: start a JSON-lines file sink (the sandbox stand-in for the
    * reference's Kafka JSON sink; text files of one JSON doc per row).
    */
  def jsonSink(
      df: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    jsonEncode(df).writeStream
      .format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** foreachBatch sink that keeps a materialized serving layout fresh:
    * each (deduped) micro-batch incrementally re-ranks only the date
    * partitions it touches (see [[graft.serving.Serving.refreshWithBatch]];
    * incremental == full-rebuild equality is asserted in ServingSpec).
    * Usage: `deduped.writeStream.foreachBatch(servingRefreshSink(root))`.
    */
  def servingRefreshSink(root: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        graft.serving.Serving.refreshWithBatch(batch.sparkSession, root, batch)

  /** Wire the full pipeline: returns the started queries
    * (raw sink, rollup+topk sink). The raw parquet sink is
    * exactly-once per the checkpointed file-commit protocol; the
    * foreachBatch legs are exactly-once via [[writeBatchIdempotent]].
    */
  def start(
      spark: SparkSession,
      source: DataFrame,
      rawPath: String,
      rollupPath: String,
      topkPath: String,
      checkpointRoot: String,
      k: Int = 5,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): Seq[StreamingQuery] = {
    val events = withEventTime(source)
    val deduped = dedupStream(events)

    val rawQ = deduped.writeStream
      .format("parquet")
      .option("path", rawPath)
      .option("checkpointLocation", s"$checkpointRoot/raw")
      .outputMode("append")
      .trigger(trigger)
      .start()

    val rollup = rollupStream(dedupStream(withEventTime(source)))
    val rollupQ = rollup.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointRoot/rollup")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.persist()
          writeBatchIdempotent(batch, batchId, rollupPath)
          writeBatchIdempotent(rankBatch(batch, k), batchId, topkPath)
          batch.unpersist()
          ()
        }
      }
      .start()

    Seq(rawQ, rollupQ)
  }
}
