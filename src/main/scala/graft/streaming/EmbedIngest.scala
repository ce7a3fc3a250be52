package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.serving.AnnIndex

/** Streaming embeddings leg: a micro-batch stream of
  * (vec_id, embedding) rows feeds the MATERIALIZED serving ANN index
  * incrementally — the embeddings twin of
  * [[StreamingPipeline.servingRefreshSink]], closing the realtime
  * ingest → serve loop the reference is built around
  * (TopKStreamingJob.kt:196-267, applied to vectors instead of
  * orders).
  *
  * Each batch appends through [[graft.serving.AnnIndex.append]] with
  * FROZEN coarse centroids (a production IVF never moves its
  * quantizer under served cells; retraining is an offline rebuild).
  * Exactly-once lands content-keyed rather than batch-id-keyed:
  * append anti-joins ids already in the index, so the at-least-once
  * batch replay Structured Streaming performs after a restart admits
  * nothing twice — the [[IncrementalDedup]] discipline with vec_id
  * playing the band index's role. An absent index root bootstraps
  * empty; the usual deployment materializes a seed corpus first
  * (training the quantizer offline) and streams deltas from there.
  */
object EmbedIngest {

  def start(spark: org.apache.spark.sql.SparkSession, source: DataFrame,
      indexRoot: String, centroids: Seq[Seq[Double]], checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) AnnIndex.append(spark, indexRoot, batch, centroids)
        ()
      }
      .start()
}
