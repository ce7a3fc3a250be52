package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** DETERMINISTIC ingest-time curation — the gated composition of
  * [[DocPipeline]]'s continuous curation (normalize → quality filter
  * → exact first-wins dedup), restructured on the [[SegmentIngest]]
  * admit pattern so the kept set is bit-reproducible: within a batch
  * the min-doc_id row per normalized fingerprint wins (a
  * `dropDuplicates` keeps an ARBITRARY row, which can never
  * hash-gate), across batches the parquet fingerprint index drops
  * anything already admitted. On an id-ordered stream the admitted
  * set therefore equals the batch composition exactly — quality
  * keep-set, deduped to the min-id representative per fingerprint —
  * which is what lets `q_doc_curate_stream` share a plain batch
  * oracle.
  *
  * Replay safety is [[SegmentIngest]]'s: a replayed batch finds its
  * own fingerprints in the index, admits nothing, and the dynamic
  * partition overwrite of an empty frame rewrites nothing.
  */
object CurationIngest {

  /** Process one micro-batch of `documents`-schema rows; returns the
    * admitted (doc_id, fp, lang, source, n_tokens) frame.
    */
  def processBatch(batch: DataFrame, batchId: Long, keptPath: String,
      indexPath: String): DataFrame = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      val cur = DocPipeline.curate(b)
      // min-id winner per fingerprint as a min(struct) aggregate (the
      // scrub family's skew discipline — no per-key window sort).
      // pinned: feeds both writes (kept + index) — the SegmentIngest
      // discipline, so the index append can't see a half-new index
      val fresh = cur
        .groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("n_tokens"),
          col("lang"), col("source"))).as("w"))
        .select(col("fp"), col("w.doc_id").as("doc_id"),
          col("w.lang").as("lang"), col("w.source").as("source"),
          col("w.n_tokens").as("n_tokens"))
        .join(readIndex(spark, indexPath), Seq("fp"), "left_anti")
        .localCheckpoint(true)
      StreamingPipeline.writeBatchIdempotent(fresh, batchId, keptPath)
      StreamingPipeline.writeBatchIdempotent(
        fresh.select(col("fp")), batchId, indexPath)
      fresh
    } finally { b.unpersist(); () }
  }

  /** The accumulated fingerprint index (empty before first admit). */
  def readIndex(spark: SparkSession, indexPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(indexPath).select("fp")
    else spark.range(0).select(lit("").as("fp"))
  }

  /** Start the curation ingest over a `documents`-schema source. */
  def start(spark: SparkSession, source: DataFrame, keptPath: String,
      indexPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        release(processBatch(batch, batchId, keptPath, indexPath))
      }
      .start()

  private[graft] def release(pinned: DataFrame): Unit =
    pinned.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
