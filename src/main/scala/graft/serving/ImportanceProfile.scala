package graft.serving

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Sample

/** Materialized DSIR importance-profile state — the serving twin of
  * [[Sample.importanceWeights]] the way `Serving.dailyCmSketch` twins
  * the query-time CM sketch: the (b, r, t) bigram-bucket count
  * profile persists under a root and incoming document batches add to
  * it, so scoring a candidate document costs one broadcast of a
  * `Buckets`-row weight table instead of a corpus pass. This is the
  * production DSIR shape: the profile is built once over the raw pool
  * (plus streamed deltas), then every selection run scores against
  * the materialized state.
  *
  * State layout: `profile_deltas/batch_id=N` partitions of at most
  * `Buckets` rows each, written idempotently per batch (dynamic
  * partition overwrite — a replayed batch rewrites its own partition
  * bit-identically, never double-counts). The served profile is the
  * SUM over deltas per bucket; counts are additive, so any batch
  * split merges to exactly the one-shot profile and served scores
  * equal [[Sample.importanceWeights]] bit-for-bit (the property that
  * lets the served gate share the direct oracle).
  *
  * 100 TB: delta partitions are bounded by `Buckets` rows regardless
  * of batch size; the re-sum reads `Buckets × batches` rows, driver
  * metadata scale. Scoring shuffles only the doc-keyed weight sum.
  */
object ImportanceProfile {

  /** Bigram-hash feature buckets (shared by build and score). */
  val Buckets = 256

  /** One-shot base profile over a document pool (delta `batch_id=-1`). */
  def materialize(docs: DataFrame, targetPred: Column, root: String): Unit =
    writeDelta(Sample.bucketProfile(docs, targetPred, Buckets), -1L, root)

  /** Idempotently write one batch's additive profile delta. */
  def writeDelta(delta: DataFrame, batchId: Long, root: String): Unit =
    delta.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$root/profile_deltas")

  /** The served (b, r, t) profile: additive re-sum over all deltas.
    * Buckets whose mass an [[eraseDoc]] delta fully cancelled drop
    * out (a one-shot build over the erased-world pool never emits
    * them — and at score time a present r=0 row would weight grams
    * the absent row ignores); a no-op filter while all deltas are
    * non-negative.
    */
  def readProfile(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/profile_deltas")
      .groupBy(col("b"))
      .agg(sum(col("r")).as("r"), sum(col("t")).as("t"))
      .filter(col("r") > 0)

  /** Right-to-be-forgotten over the materialized profile: the erased
    * document's bigram-bucket counts are subtracted via a
    * CONTENT-KEYED NEGATIVE DELTA — one more additive partition, at
    * the deterministic `batch_id = -(docId) - 2` (−1 is the base
    * build; ingest batches are ≥ 0, so erase partitions can never
    * collide with either). [[readProfile]] is a plain re-sum, so the
    * post-erase profile equals the one-shot build over the pool
    * without the doc, bit for bit — and the deterministic partition
    * makes a crashed or repeated erase idempotent (the dynamic
    * overwrite rewrites the same partition with the same content,
    * never double-subtracting). `docs`/`targetPred` must be the same
    * corpus frame and predicate the ingest legs used — the contract
    * every delta already carries.
    */
  def eraseDoc(spark: SparkSession, root: String, docs: DataFrame,
      docId: Long, targetPred: Column): Unit = {
    val d = Sample.bucketProfile(
      docs.filter(col("doc_id") === docId), targetPred, Buckets)
    writeDelta(
      d.select(col("b"), (-col("r")).as("r"), (-col("t")).as("t")),
      -docId - 2L, root)
  }

  /** Score documents against the materialized profile — equal to
    * [[Sample.importanceWeights]] over the pool the deltas cover.
    */
  def score(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Sample.scoreAgainstProfile(docs, readProfile(spark, root),
      Buckets, idCol, textCol)
}
