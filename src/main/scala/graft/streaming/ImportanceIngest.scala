package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Sample
import graft.serving.ImportanceProfile

/** Streaming leg of the materialized DSIR profile
  * ([[ImportanceProfile]]): each micro-batch of documents adds its
  * bigram-bucket counts as one idempotent delta partition. Counts are
  * additive, so after any batch split the served profile equals the
  * one-shot build over everything ingested — and a replayed batch
  * rewrites its own `batch_id` partition bit-identically
  * (exactly-once without any read-modify-write of prior state).
  */
object ImportanceIngest {

  /** Process one micro-batch (exposed for replay tests). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      targetPred: Column): Unit =
    ImportanceProfile.writeDelta(
      Sample.bucketProfile(batch, targetPred, ImportanceProfile.Buckets),
      batchId, root)

  /** Start the profile-ingest stream over a `documents`-schema source. */
  def start(spark: SparkSession, source: DataFrame, root: String,
      checkpoint: String, targetPred: Column,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, targetPred)
      }
      .start()
}
