package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.NearDup

/** Ingestion-time incremental near-dup dedup: every micro-batch of
  * documents is checked against an accumulated MinHash-LSH band index
  * of all previously ADMITTED docs, plus exact-verified within the
  * batch — so a continuously-fed corpus stays deduped as it lands,
  * without nightly full-corpus reruns.
  *
  * State is a parquet band index (admitted doc → 16 band hashes),
  * not executor memory: restart-safe for free, shardable by band
  * hash at any size, and appended idempotently per batch (dynamic
  * partition overwrite on batch_id — a retried batch overwrites its
  * own partition instead of double-inserting).
  *
  * Two-tier decision, mirroring how production crawl pipelines trade
  * cost for exactness:
  *  - vs HISTORY: a band-bucket hit alone rejects (no re-reading old
  *    docs' shingles). Approximate with known odds: a true near-dup
  *    at Jaccard 0.8 collides in some band w.p. ~0.9998 (16 bands ×
  *    4 rows), an unrelated pair w.p. ~1e-9 per band row; identical
  *    docs always collide.
  *  - WITHIN the batch: full exact-verified `minhashPairs` +
  *    `canonicalize`, keeping the min-id survivor per dup group —
  *    exactness where the data is already in hand.
  */
object IncrementalDedup {

  val bandsN = 16
  val rowsPerBand = 4

  /** Band buckets (doc_id, band_idx, band_hash) for a static frame.
    * Built over UNPERSISTED postings: the signature aggregation is the
    * only pass, and each micro-batch is a distinct plan — a cached
    * postings per batch would accumulate in executor storage with
    * nothing ever releasing it.
    */
  def bandBuckets(docs: DataFrame): DataFrame =
    NearDup.minhashSigsFromPostings(
        NearDup.postingsNoCache(docs, n = 3), bandsN * rowsPerBand)
      .withColumn("bands", NearDup.lshBands(col("sig"), bandsN, rowsPerBand))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))

  /** Process one micro-batch: reject vs the index, dedup within the
    * batch, append survivors + their bands. Returns the admitted
    * frame (for tests/inspection).
    */
  def processBatch(batch: DataFrame, batchId: Long,
      admittedPath: String, indexPath: String): DataFrame = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      val buckets = bandBuckets(b)
      val index = readIndex(spark, indexPath)
      // tier 1: LSH-reject against history (semi-join on band buckets)
      val hitHistory = buckets.join(index, Seq("band_idx", "band_hash"), "left_semi")
        .select(col("doc_id")).distinct()
      val fresh = b.join(hitHistory, Seq("doc_id"), "left_anti").persist()
      try {
        // tier 2: exact within-batch dedup — keep min-id survivors
        val pairs = NearDup.minhashPairs(fresh)
        val dropped = NearDup.canonicalize(pairs)
          .filter(col("doc_id") =!= col("canonical_id"))
          .select(col("doc_id"))
        val admitted = fresh.join(dropped, Seq("doc_id"), "left_anti")
          .localCheckpoint(true)
        StreamingPipeline.writeBatchIdempotent(admitted, batchId, admittedPath)
        StreamingPipeline.writeBatchIdempotent(
          bandBuckets(admitted), batchId, indexPath)
        admitted
      } finally { fresh.unpersist(); () }
    } finally {
      b.unpersist()
      // the per-batch minhash/canonicalize intermediates registered
      // by NearDup are one-shot here — release them so a long-running
      // ingest doesn't accumulate cached batch plans.
      NearDup.releaseCaches()
    }
  }

  /** The accumulated band index (empty before the first admit) —
    * one FS existence RPC per batch, no exception-classname games.
    */
  def readIndex(spark: SparkSession, indexPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(indexPath).select("band_idx", "band_hash")
    else spark.range(0).select(lit(0).as("band_idx"), lit(0L).as("band_hash"))
  }

  /** Start the ingest stream over a `documents`-schema source. */
  def start(spark: SparkSession, source: DataFrame, admittedPath: String,
      indexPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, admittedPath, indexPath); ()
      }
      .start()
}
