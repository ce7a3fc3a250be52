package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingestion-time WAU state — the streaming twin of
  * [[graft.queries.AnalyticsQueries.wauDaily]], on the
  * monotone-set-state pattern of [[CovisitIngest]]: the curve's
  * input is the DISTINCT (user, day) set, which only ever GROWS, so
  * each micro-batch appends its own distinct rows under its
  * `batch_id` partition and the read path re-distincts the union
  * before the ×7 window expand — set union is associative,
  * commutative, and idempotent, so stream == batch holds for ANY
  * split and ANY arrival order, and a replayed batch overwrites its
  * own partition bit-identically (no-op).
  *
  * Scale contract: the per-batch distinct is the map-side pass over
  * the only big thing (raw events); stored state is bounded by
  * users × active-days, and the read-side expand/count runs over
  * that bounded state, never raw history.
  */
object WauIngest {

  /** Process one micro-batch: append the batch's distinct
    * (user_id, day) rows under its `batch_id` partition.
    */
  def processBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      batch.select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day")).distinct(),
      batchId, path)

  /** The WAU curve AS OF the ingested state: re-distinct the batch
    * partitions, then the same expand/count as the batch op —
    * identical output, shared oracle.
    */
  def readWau(spark: SparkSession, path: String): DataFrame =
    graft.queries.AnalyticsQueries.wauOf(
      StateCompactor.readState(spark, path)
        .select(col("user_id"), col("day")).distinct())

  /** Fold committed batch partitions into one distinct set
    * ([[StateCompactor]] — replay/crash-safe maintenance slot).
    */
  def compact(spark: SparkSession, path: String): Unit =
    StateCompactor.compactDistinct(spark, path, Seq("user_id", "day"))

  /** Right-to-be-forgotten: drop the user's (user, day) rows from
    * the whole state root ([[StateCompactor.eraseWhere]] — quiesced
    * maintenance slot; crash-safe via the generation manifest).
    */
  def eraseUser(spark: SparkSession, path: String, userId: Long): Unit =
    StateCompactor.eraseWhere(spark, path, col("user_id") === userId)

  /** Start the ingest stream over an `events`-schema source. */
  def start(spark: SparkSession, source: DataFrame, path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, path)
      }
      .start()
}
