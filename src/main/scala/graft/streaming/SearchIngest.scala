package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.serving.SearchIndex

/** Streaming documents leg for lexical search: a micro-batch stream
  * of (doc_id, text) rows feeds the MATERIALIZED inverted index
  * incrementally — the text twin of [[EmbedIngest]], closing the
  * realtime ingest → serve loop for sparse retrieval.
  *
  * Each batch appends through [[graft.serving.SearchIndex.append]],
  * which keeps postings, df deltas, and the corpus-size delta
  * consistent and is content-keyed idempotent (doc ids already in
  * the index admit nothing), so Structured Streaming's at-least-once
  * batch replay after a restart is absorbed — the [[IncrementalDedup]]
  * discipline with doc_id in the band index's role. An absent index
  * root bootstraps empty; the usual deployment materializes a seed
  * corpus first and streams deltas from there.
  */
object SearchIngest {

  def start(spark: org.apache.spark.sql.SparkSession, source: DataFrame,
      indexRoot: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) SearchIndex.append(spark, indexRoot, batch)
        ()
      }
      .start()
}
