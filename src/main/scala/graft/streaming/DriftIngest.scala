package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Drift

/** Streaming twin of the corpus drift audit ([[Drift.audit]]) — the
  * monitor a pipeline runs CONTINUOUSLY while a fresh crawl lands
  * next to the frozen reference, not once at the end. Drift's
  * (feature, value, ca, cb) counts are plain sums, so this is the
  * additive-count-state pattern ([[BoilerplateIngest]], the served
  * CM/value-histogram tables): each micro-batch appends its bounded
  * per-(feature, value) count delta under its `batch_id` partition —
  * map-side partial aggregation, nothing row-sized persists — and
  * the audit re-derives at read by re-summing deltas through
  * [[Drift.auditFromCounts]].
  *
  * Additivity gives stream == batch for ANY batch split and ANY
  * arrival order, and a replayed batch overwrites its own partition
  * with identical content (idempotent batch_id write) — the same
  * contract as every count-state ingest leg in this repo.
  */
object DriftIngest {

  /** Process one micro-batch: append its (feature, value, ca, cb)
    * delta under the `batchId` partition. `weight` is each row's mass
    * ([[Drift.featureCounts]]) — weighted sums are just as additive
    * as counts, so the token-mass monitor streams identically.
    */
  def processBatch(batch: DataFrame, batchId: Long, countsPath: String,
      isRef: Column, features: Seq[(String, Column)],
      weight: Column = org.apache.spark.sql.functions.lit(1L)): Unit =
    StreamingPipeline.writeBatchIdempotent(
      Drift.featureCounts(batch, isRef, features, weight), batchId, countsPath)

  /** The drift audit AS OF the ingested state: re-sum the batch
    * deltas, then the exact integer TVD derivation. Same output
    * schema as the batch op. Reads through [[StateCompactor]] so
    * post-erase generations resolve like live batch partitions.
    */
  def readAudit(spark: SparkSession, countsPath: String): DataFrame =
    Drift.auditFromCounts(StateCompactor.readState(spark, countsPath)
      .select("feature", "value", "ca", "cb"))

  /** Fold committed batch partitions at the count grain (sums are the
    * state's own merge, so compaction commutes with [[readAudit]]).
    */
  def compact(spark: SparkSession, countsPath: String): Unit =
    StateCompactor.compactAdditive(spark, countsPath,
      Seq("feature", "value"), Seq("ca", "cb"))

  /** Right-to-be-forgotten over the drift-count state: the additive
    * (feature, value, ca, cb) deltas carry no doc dimension, so the
    * erased doc's mass can only leave by rebuilding the counts from
    * the retained corpus — [[StateCompactor.rewriteState]]'s
    * manifest-committed fold, the [[graft.serving.ImportanceProfile]]
    * contract: `docs`/`isRef`/`features`/`weight` must be the same
    * frame and definitions the ingest legs used. Idempotently
    * re-runnable (same retained corpus → same generation content);
    * replayed folded batches stay invisible.
    */
  def eraseDoc(spark: SparkSession, countsPath: String, docs: DataFrame,
      docId: Long, isRef: Column, features: Seq[(String, Column)],
      weight: Column = org.apache.spark.sql.functions.lit(1L)): Unit =
    StateCompactor.rewriteState(spark, countsPath,
      Drift.featureCounts(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") =!= docId),
        isRef, features, weight))

  /** Start the ingest stream over a `documents`-schema source. */
  def start(spark: SparkSession, source: DataFrame, countsPath: String,
      checkpoint: String, isRef: Column, features: Seq[(String, Column)],
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, countsPath, isRef, features)
      }
      .start()
}
