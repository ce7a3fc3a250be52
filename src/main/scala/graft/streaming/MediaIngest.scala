package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingestion-time MEDIA dedup — the streaming twin of
  * [[graft.queries.MediaQueries.mediaDedup]], closing the one gated
  * family that had no streaming ingest leg: every micro-batch of
  * binary media rows collapses to a per-content-hash delta
  * (canonical id = min media_id in the batch, copy count), appended
  * as an idempotent `batch_id` partition; the served dedup table is
  * the (min, sum) re-merge over deltas. Both merges are associative
  * and commutative, so stream == batch holds for ANY split and ANY
  * arrival order — the additive-state pattern ([[CovisitIngest]],
  * [[DriftIngest]]), preferred here over [[SegmentIngest]]'s
  * admission index because dedup over content hashes is mergeable
  * state, not first-claim state.
  *
  * Payload bytes never persist and never shuffle: the 128-bit md5 is
  * computed executor-side on the binary column and only (hash,
  * min-id, count) rows — bounded by distinct content per batch —
  * cross the exchange or land in state, the [[SegmentIngest]]
  * hash-only discipline at whole-asset grain.
  */
object MediaIngest {

  /** Process one micro-batch of `media`-schema rows (media_id,
    * bytes, ...): append the batch's (content_hash, canonical_id,
    * n_copies) delta under its `batch_id` partition.
    */
  def processBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      batch
        .select(md5(col("bytes")).as("content_hash"), col("media_id"))
        .groupBy(col("content_hash"))
        .agg(min(col("media_id")).as("canonical_id"),
          count(lit(1)).as("n_copies")),
      batchId, path)

  /** The dedup table AS OF the ingested state — identical output to
    * the batch op over everything ingested (min of mins, sum of
    * counts), which is what lets the stream gate share
    * `q_media_dedup`'s oracle verbatim.
    */
  def readDedup(spark: SparkSession, path: String): DataFrame =
    StateCompactor.readState(spark, path)
      .groupBy(col("content_hash"))
      .agg(min(col("canonical_id")).as("canonical_id"),
        sum(col("n_copies")).as("n_copies"))

  /** Fold committed batch partitions at the state's own grain
    * ([[StateCompactor.compactWith]] — min/sum are the state's own
    * merge functions, so compaction commutes with [[readDedup]]).
    */
  def compact(spark: SparkSession, path: String): Unit =
    StateCompactor.compactWith(spark, path, Seq("content_hash"),
      Seq("canonical_id" -> "min", "n_copies" -> "sum"))

  /** Right-to-be-forgotten over the media-dedup state: additive
    * counts can't subtract and a min-merged canonical id can't
    * un-min (the state never kept the second-smallest owner), so the
    * whole visible state folds into a new generation computed from
    * the retained corpus — [[StateCompactor.rewriteState]]'s
    * manifest-committed rebuild, the [[SegmentIngest.eraseDoc]]
    * contract at whole-asset grain. `media` is the full media corpus
    * the ingest has seen (caller-owned); a BIDIRECTIONAL stale-frame
    * guard refuses a frame carrying content hashes the state never
    * admitted AND a frame from which non-victim hashes would leave
    * the state (missing assets — which would silently erase other
    * assets' dedup state).
    * Quiesced-slot + replay invisibility + crash re-runnability
    * inherited from rewriteState.
    */
  def eraseMedia(spark: SparkSession, media: DataFrame, mediaId: Long,
      path: String): Unit = {
    val retained = media.filter(col("media_id") =!= mediaId)
    val newState = retained
      .select(md5(col("bytes")).as("content_hash"), col("media_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .localCheckpoint(true) // pinned: guard probe + generation write
    try {
      val state = StateCompactor.readState(spark, path).select(col("content_hash"))
      val unseen = newState.select(col("content_hash"))
        .join(state, Seq("content_hash"), "left_anti")
      if (!unseen.isEmpty)
        throw new IllegalArgumentException(
          s"eraseMedia: media frame contains content the state at $path " +
            "never ingested — wrong corpus for this state root")
      // reverse direction (the SegmentIngest rule): hashes LEAVING
      // the state must be the victim's own content — a frame missing
      // unrelated assets would silently drop their dedup state
      val victim = media.filter(col("media_id") === mediaId)
        .select(md5(col("bytes")).as("content_hash"))
      val leaving = state
        .join(newState.select(col("content_hash")), Seq("content_hash"), "left_anti")
        .join(victim, Seq("content_hash"), "left_anti")
      if (!leaving.isEmpty)
        throw new IllegalArgumentException(
          s"eraseMedia: media frame is missing assets the state at $path " +
            "ingested — erasing would drop other assets' dedup state")
      StateCompactor.rewriteState(spark, path, newState)
    } finally newState.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
  }

  /** Process one micro-batch for the SIMILARITY tier — the streaming
    * twin of [[graft.queries.MediaQueries.mediaNearDup]]'s signature
    * state: the batch's payloads collapse to per-content-hash
    * (canonical id, stub embedding) rows — both keys computed
    * row-local in the scan stage (codegen'd md5 +
    * [[graft.functions.EmbedStub]]); identical bytes have identical
    * embeddings, so min is a deterministic pick — appended as an
    * idempotent `batch_id` partition. Min-merge over deltas at read
    * reproduces the batch op's canonical set exactly, for ANY split
    * and ANY arrival order.
    *
    * The payload never persists and never shuffles: 40 B of hash +
    * 128 B of vector per DISTINCT content per batch is the state's
    * whole exchange and footprint — at 100 TB of media that is the
    * difference between a similarity index and a second copy of the
    * corpus.
    */
  def processSignatureBatch(batch: DataFrame, batchId: Long,
      path: String): Unit =
    StreamingPipeline.writeBatchIdempotent(
      batch
        .select(md5(col("bytes")).as("content_hash"), col("media_id"),
          graft.functions.MediaExprs.embed_stub(col("bytes")).as("embedding"))
        .groupBy(col("content_hash"))
        .agg(min(col("media_id")).as("canonical_id"),
          // identical bytes → identical embedding; min is the
          // deterministic pick (and the merge StateCompactor folds)
          min(col("embedding")).as("embedding")),
      batchId, path)

  /** Near-duplicate pairs over the ingested signature state: collapse
    * the deltas to the canonical asset set (min of per-batch min ids;
    * any embedding — identical content, identical vector), then the
    * same RHP-LSH banding + exact-cosine verify the batch gate runs
    * ([[graft.ops.Ann.rhpNearDupPairs]]), which is what lets the
    * stream gate share `q_media_neardup`'s oracle verbatim.
    *
    * The BAND index is derived at read, not persisted per batch, and
    * deliberately: this library's hyperplanes are data-derived (the
    * 64 lowest-id canonicals, so the oracle can replay them), and
    * that set is only stable once ingestion order no longer matters —
    * banding incrementally against an early snapshot would key later
    * batches to drifted planes. A deployment with FIXED random planes
    * (seeded Gaussian — the usual production choice) can band each
    * batch at ingest with this same delta state; the signature state,
    * which is the expensive part (one pass over payload bytes, ever),
    * is shared by both designs.
    */
  def readNearDup(spark: SparkSession, path: String,
      threshold: Double = 0.8): DataFrame = {
    val canon = StateCompactor.readState(spark, path)
      .groupBy(col("content_hash"))
      .agg(min(col("canonical_id")).as("media_id"),
        min(col("embedding")).as("embedding"))
      .select(col("media_id"), col("embedding"))
    graft.ops.Ann.rhpNearDupPairs(canon, threshold,
      idCol = "media_id", vecCol = "embedding")
  }

  /** Fold committed signature deltas at the state's own grain —
    * (min, min) merges commute with [[readNearDup]]'s collapse.
    */
  def compactSignatures(spark: SparkSession, path: String): Unit =
    StateCompactor.compactWith(spark, path, Seq("content_hash"),
      Seq("canonical_id" -> "min", "embedding" -> "min"))

  /** Start the ingest stream over a `media`-schema source. */
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
