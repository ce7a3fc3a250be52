package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.serving.PqIndex

/** Streaming leg of the materialized IVFADC index — [[EmbedIngest]]
  * for the PQ layout: micro-batches of (vec_id, embedding) rows are
  * frozen-codebook-encoded and appended into their cell directories
  * ([[PqIndex.append]]), keeping the billion-scale serving codes
  * current without a rebuild.
  *
  * Exactly-once lands content-keyed ([[graft.ops.KMeans.stagedCodes]]
  * anti-joins ids already coded), so at-least-once batch replays admit
  * nothing. Unlike [[EmbedIngest]], an absent root does NOT bootstrap:
  * PQ codebooks require a trained seed corpus — materialize one
  * offline first, then stream deltas (the documented IVFADC
  * deployment; a quantizer is never trained on a micro-batch).
  */
object PqIngest {

  def start(spark: org.apache.spark.sql.SparkSession, source: DataFrame,
      root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) PqIndex.append(spark, root, batch)
        ()
      }
      .start()
}
