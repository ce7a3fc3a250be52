package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.serving.StarTree

/** Streaming star-tree leg: a micro-batch event stream keeps the
  * materialized CUBE nodes ([[StarTree]]) current — Pinot's realtime
  * segments feeding the star-tree index, Spark-first. Completes the
  * pattern every serving structure here follows: each materialized
  * index has a streaming feed ([[StreamingPipeline.servingRefreshSink]]
  * → ranked tables, [[EmbedIngest]] → ANN index, [[SearchIngest]] →
  * inverted index, [[IncrementalDedup]] → band index).
  *
  * Exactly-once under Structured Streaming's at-least-once foreachBatch
  * replays via [[StarTree.refresh]]'s batch-id guard (the
  * [[graft.serving.Serving.refreshWithBatch]] discipline): a
  * re-delivered batchId is a no-op. Per-batch cost is one pass over
  * the BATCH (map-side-combined to the tiny full-grain base), never
  * the history — the nodes' SUM/COUNT metrics merge additively.
  */
object StarTreeIngest {

  def start(spark: org.apache.spark.sql.SparkSession, source: DataFrame,
      root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) StarTree.refresh(spark, root, batch, batchId)
        ()
      }
      .start()
}
