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

  /** Start the curation stream: `source` must carry the documents
    * schema (doc_id, text, lang, source, n_chars). Kept, deduped docs
    * append to `keptPath` as parquet with exactly-once file-sink
    * semantics.
    */
  def start(spark: SparkSession, source: DataFrame, keptPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    curate(source)
      .dropDuplicates("fp")
      .writeStream
      .format("parquet")
      .option("path", keptPath)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
