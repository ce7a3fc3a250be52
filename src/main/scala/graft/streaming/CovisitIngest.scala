package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingestion-time co-visitation state — the streaming twin of
  * [[graft.queries.AnalyticsQueries.covisitLift]], using the
  * additive/monotone-state pattern of [[BoilerplateIngest]]: the
  * association input is the DISTINCT (user, type) set, which only
  * ever GROWS, so each micro-batch appends its own distinct rows
  * under its `batch_id` partition and the read path re-distincts the
  * union before deriving pairs — set union is associative,
  * commutative, and idempotent, so stream == batch holds for ANY
  * batch split and ANY arrival order, and a replayed batch
  * overwrites its own partition with identical content (a bit-exact
  * no-op).
  *
  * Scale contract: the per-batch distinct is the map-side-combining
  * pass over the only big thing (raw events); the stored state is
  * bounded by users × type-alphabet — the read-side derivation
  * (pair generation, reach, lift) runs over that bounded state,
  * never over raw history.
  */
object CovisitIngest {

  /** Process one micro-batch: append the batch's distinct
    * (user, type) rows under its `batch_id` partition.
    */
  def processBatch(batch: DataFrame, batchId: Long, usPath: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      batch.select(col("user_id"), col("event_type")).distinct(),
      batchId, usPath)

  /** The association table AS OF the ingested state: re-distinct the
    * batch partitions (cross-batch repeats collapse here), then the
    * same pair/reach/lift derivation as the batch op — identical
    * output, shared oracle.
    */
  def readLift(spark: SparkSession, usPath: String): DataFrame =
    graft.queries.AnalyticsQueries.liftOf(
      StateCompactor.readState(spark, usPath)
        .select(col("user_id"), col("event_type")).distinct())

  /** Fold committed batch partitions into one distinct set
    * ([[StateCompactor]] — replay/crash-safe maintenance slot).
    */
  def compact(spark: SparkSession, usPath: String): Unit =
    StateCompactor.compactDistinct(spark, usPath,
      Seq("user_id", "event_type"))

  /** Right-to-be-forgotten: drop the user's (user, type) rows from
    * the whole state root ([[StateCompactor.eraseWhere]] — quiesced
    * maintenance slot; crash-safe via the generation manifest).
    */
  def eraseUser(spark: SparkSession, usPath: String, userId: Long): Unit =
    StateCompactor.eraseWhere(spark, usPath, col("user_id") === userId)

  /** Start the ingest stream over an `events`-schema source. */
  def start(spark: SparkSession, source: DataFrame, usPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, usPath)
      }
      .start()
}
