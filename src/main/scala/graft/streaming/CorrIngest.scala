package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingestion-time correlation-moment state — the streaming twin of
  * [[graft.queries.OlapQueries.corrComponents]], on the ADDITIVE
  * state pattern of [[LmIngest]]: the six moments (n, Σx, Σy, Σxy,
  * Σx², Σy² per event_type, DECIMAL(38,0)) are plain sums, so each
  * micro-batch appends its own partial under its `batch_id`
  * partition and the read path re-sums before the guarded wire
  * casts — sum is associative and commutative, so stream == batch
  * holds for ANY split and ANY arrival order, and a replayed batch
  * overwrites its own partition bit-identically (no-op).
  *
  * Scale contract: the per-batch moment aggregation is the map-side
  * pass over the only big thing (raw events); stored state is
  * bounded by type-alphabet × batches (compacting to alphabet rows),
  * and the read-side merge runs over that kilobyte table.
  */
object CorrIngest {

  /** Process one micro-batch: append the batch's per-type moment
    * partials under its `batch_id` partition.
    */
  def processBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      graft.queries.OlapQueries.corrMomentState(batch), batchId, path)

  /** The moment table AS OF the ingested state: re-sum the batch
    * partials, then the same guarded BIGINT wire as the batch op —
    * identical output, shared oracle.
    */
  def readMoments(spark: SparkSession, path: String): DataFrame =
    graft.queries.OlapQueries.corrWire(StateCompactor.readState(spark, path))

  /** Fold committed batch partitions ([[StateCompactor]] — sums the
    * moments at the type grain; replay/crash-safe maintenance slot).
    */
  def compact(spark: SparkSession, path: String): Unit =
    StateCompactor.compactAdditive(spark, path, Seq("event_type"),
      Seq("n", "sx", "sy", "sxy", "sxx", "syy"))

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
