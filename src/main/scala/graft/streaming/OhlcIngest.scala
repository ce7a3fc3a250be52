package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingestion-time OHLC state — the streaming twin of
  * [[graft.queries.OlapQueries.ohlcBars]]: open/close look
  * order-dependent ("first"/"last" value of the hour) but carried as
  * full min/max (tu, event_id, value_cents) STRUCTS they are
  * mergeable — min of mins is the global min under the same
  * lexicographic order — and high/low/count are plain min/max/sum.
  * Each micro-batch appends its per-(hour, type) partial bars under
  * its `batch_id` partition; the read path merges and projects the
  * final bars. All merges are associative and commutative, so
  * stream == batch holds for ANY split and ANY arrival order — an
  * hour's TRUE opening trade can arrive in the last batch and still
  * win the struct-min — and a replayed batch overwrites its own
  * partition bit-identically (no-op).
  *
  * Scale contract: the per-batch bar aggregation is the map-side
  * pass over raw events; stored state is bounded by
  * hours × type-alphabet × batches (compacting to one bar per
  * (hour, type) via [[StateCompactor.compactWith]]'s min/max/sum
  * merge).
  */
object OhlcIngest {

  /** Process one micro-batch: append the batch's partial bars under
    * its `batch_id` partition.
    */
  def processBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      graft.queries.OlapQueries.ohlcPartials(batch), batchId, path)

  /** The hourly bars AS OF the ingested state: merge the partials —
    * identical output to the batch op, shared oracle.
    */
  def readBars(spark: SparkSession, path: String): DataFrame =
    graft.queries.OlapQueries.ohlcMerge(StateCompactor.readState(spark, path))

  /** Fold committed batch partitions ([[StateCompactor.compactWith]]
    * — struct-min/struct-max opens/closes, min/max extremes, summed
    * counts at the (hour, type) grain; replay/crash-safe maintenance
    * slot).
    */
  def compact(spark: SparkSession, path: String): Unit =
    StateCompactor.compactWith(spark, path,
      Seq("hour_start_ms", "event_type"),
      Seq(("o", "min"), ("c", "max"), ("high_cents", "max"),
        ("low_cents", "min"), ("n_events", "sum")))

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
