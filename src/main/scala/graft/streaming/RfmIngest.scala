package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingestion-time RFM state — the streaming twin of
  * [[graft.queries.AnalyticsQueries.rfmSegments]]: the per-user
  * (recency, frequency, monetary) triple is MERGEABLE — recency is a
  * max, the other two are sums — so each micro-batch appends its own
  * per-user partial under its `batch_id` partition and the read path
  * merges by (max, sum, sum) before the global quartile rankings.
  * Max and sum are associative and commutative, so stream == batch
  * holds for ANY split and ANY arrival order, and a replayed batch
  * overwrites its own partition bit-identically (no-op). The
  * quartile/segment derivation stays a derive-at-read over the
  * bounded per-user table — tiles are GLOBAL ranks, never additive,
  * so no per-batch tile state could be correct.
  *
  * Scale contract: the per-batch per-user aggregation is the
  * map-side pass over raw events; stored state is bounded by
  * purchasing-users × batches (compacting to one row per user via
  * [[StateCompactor.compactWith]]'s max/sum merge).
  */
object RfmIngest {

  /** Process one micro-batch: append the batch's per-user
    * (max last_us, freq, cents) partials under its `batch_id`
    * partition.
    */
  def processBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      graft.queries.AnalyticsQueries.rfmPerUser(batch), batchId, path)

  /** The segment rollup AS OF the ingested state: merge the per-user
    * partials, then the same quartile+segment derivation as the
    * batch op — identical output, shared oracle.
    */
  def readSegments(spark: SparkSession, path: String): DataFrame =
    graft.queries.AnalyticsQueries.rfmOfPerUser(
      StateCompactor.readState(spark, path))

  /** Fold committed batch partitions ([[StateCompactor.compactWith]]
    * — max recency, summed counts/cents at the user grain;
    * replay/crash-safe maintenance slot).
    */
  def compact(spark: SparkSession, path: String): Unit =
    StateCompactor.compactWith(spark, path, Seq("user_id"),
      Seq(("last_us", "max"), ("freq", "sum"), ("monetary_cents", "sum")))

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
