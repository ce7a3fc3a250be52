package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Text

/** Continuous training-data ingestion: the batch document-curation
  * path (normalize → quality filter → exact dedup) run as ONE
  * Structured Streaming query, so a corpus that arrives incrementally
  * (crawl drops, upload batches) is curated as it lands instead of in
  * nightly rebuilds.
  *
  * The stateful piece is the exact-dedup: `dropDuplicates` on the
  * normalized-text fingerprint keeps first-wins semantics ACROSS
  * micro-batches (the same doc arriving in a later batch is dropped
  * by state, not by luck). State size = one fingerprint per distinct
  * kept doc; for bounded-state deployments swap in
  * `dropDuplicatesWithinWatermark` keyed on an arrival-time column —
  * the Tables/serving layer downstream is unchanged either way.
  *
  * Quality thresholds mirror `DocQueries.docQualityFilter` exactly
  * (token-count bounds, stopword ratio, type-token ratio), so the
  * streaming keep-set equals the batch keep-set on the same corpus —
  * asserted by StreamingVariantsSpec.
  */
object DocPipeline {

  /** Normalize + quality-filter + fingerprint one micro-batch (pure,
    * also usable on batch frames — the parity surface).
    */
  def curate(docs: DataFrame): DataFrame = {
    val stats = docs.select(
      col("doc_id"), col("text"), col("lang"), col("source"),
      Text.normalize(col("text")).as("norm_text"),
      Text.tokenCount(col("text")).as("n_tokens"),
      Text.distinctTokenCount(col("text")).as("n_distinct"),
      Text.markerHits(col("text"), Text.stopwords).as("n_stop"))
    stats
      .filter(col("n_tokens") >= 5 && col("n_tokens") <= 500 &&
        col("n_stop").cast("double") / col("n_tokens") <= 0.5 &&
        col("n_distinct").cast("double") / col("n_tokens") >= 0.2)
      .withColumn("fp", md5(col("norm_text")))
      .select("doc_id", "fp", "lang", "source", "n_tokens")
  }

  /** Decontamination AT INGEST — the streaming twin of
    * [[graft.ops.NearDup.contaminationOverlapBloom]]: a document is
    * dropped if ANY of its n-gram shingles might be in the benchmark
    * bloom. Entirely row-local (shingle HOF + the codegen'd
    * [[graft.functions.BloomExprs]] probe over a ~KB sketch literal),
    * so it composes into the continuous query with no extra state or
    * shuffle — the eval set itself never ships with the stream.
    *
    * Semantics are deliberately CONSERVATIVE: bloom false positives
    * drop clean docs, never admit contaminated ones. Per-doc FP odds
    * ≈ shingles·fpp, so the sketch must be sized tight
    * ([[evalSketch]] defaults fpp = 1e-6 → ~0.02% spurious drops at
    * 200 shingles/doc); the exact batch op remains the audit surface.
    */
  def decontaminate(docs: DataFrame, evalBloom: Array[Byte], n: Int = 3): DataFrame =
    docs.filter(!exists(
      Text.shinglesFromTokens(Text.tokens(col("text")), n),
      s => graft.functions.BloomExprs.might_contain_long(xxhash64(s), evalBloom)))

  /** Build the benchmark shingle bloom once, offline (eval sets are
    * bounded — the sketch is driver metadata like IVF centroids).
    */
  def evalSketch(evalDocs: DataFrame, n: Int = 3, fpp: Double = 1e-6): Array[Byte] = {
    val sh = evalDocs
      .select(explode(Text.shinglesFromTokens(Text.tokens(col("text")), n)).as("sh"))
      .distinct()
      .select(xxhash64(col("sh")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try graft.ops.BloomJoin.buildSketch(sh, "h", math.max(sh.count(), 1024L), fpp)
    finally sh.unpersist(blocking = false)
  }

  /** Start the curation stream: `source` must carry the documents
    * schema (doc_id, text, lang, source, n_chars). Kept, deduped docs
    * append to `keptPath` as parquet with exactly-once file-sink
    * semantics. `evalBloom` (from [[evalSketch]]) additionally drops
    * benchmark-contaminated docs at ingest.
    */
  def start(spark: SparkSession, source: DataFrame, keptPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      evalBloom: Option[Array[Byte]] = None): StreamingQuery =
    curate(evalBloom.fold(source)(decontaminate(source, _)))
      .dropDuplicates("fp")
      .writeStream
      .format("parquet")
      .option("path", keptPath)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
