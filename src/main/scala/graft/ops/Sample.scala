package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: stratified
  * Bernoulli keeps, fixed-n per-group samples, and budget-driven
  * mixture sampling (the "data mixing" step that hits a target token
  * budget with per-stratum weights).
  *
  * All decisions are pure functions of a 60-bit md5 hash of the row
  * id — stable across runs, engines, partitionings, and incremental
  * appends (a doc's fate never changes when other docs arrive), and
  * reproducible in the DuckDB oracle
  * (`('0x'||substring(md5(id),1,15))::BIGINT`). No `rand()`, no RNG
  * state, no driver round-trips: every operator is a narrow filter or
  * one keyed window, so the plans scale like scans.
  */
object Sample {

  /** 2^60 — the md5-60-bit hash space size. */
  val HashSpace: Long = 1L << 60

  /** Uniform 60-bit hash of the id in [0, 2^60). */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Integer keep-threshold for a rate in [0,1]. */
  def thresholdFor(rate: Double): Long = (rate * HashSpace.toDouble).toLong

  /** Keep each row iff hash60(id) < threshold(rate(stratum)) — an
    * exact-integer Bernoulli(rate) per stratum, independent across
    * rows. Strata not in `rates` use `defaultRate`.
    */
  def stratifiedBernoulli(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdFor(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thresholdFor(rate))).otherwise(acc)
    }
    df.filter(hash60(col(idCol)) < thr)
  }

  /** Exactly min(n, |group|) rows per group — the deterministic
    * equivalent of per-group reservoir sampling: rank by (hash, id)
    * inside each group, keep the first n. One shuffle on the group
    * key; the rank filter plans as WindowGroupLimit (bounded
    * per-group state), same as the top-K family.
    */
  def perGroupFixedN(df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash60(col(idCol)).asc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES,
    * "Weighted random sampling with a reservoir", IPL 2006): the k
    * rows with the largest key u^(1/w), where u = (hash60(id)+1)/2^60
    * ∈ (0,1] and w > 0 is the row weight — inclusion probability
    * proportional to weight, yet fully deterministic in the id hash
    * (re-runs, repartitions, and engine swaps select the same rows).
    * Ranked by the monotone-equivalent ln(u)/w (one transcendental
    * instead of pow; ln(u) ≤ 0, so dividing by a larger weight pulls
    * the key toward 0 = better), with the id as tie-break.
    *
    * Scale shape: `orderBy.limit(k)` plans as TakeOrderedAndProject —
    * a bounded per-partition heap of k rows plus a k-per-partition
    * driver merge, exactly the global top-K shape ([[TopK.topKGlobal]]).
    * No global sort, no window, no shuffle of the full input.
    */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val u = (hash60(col(idCol)).cast("double") + lit(1.0)) / lit(HashSpace.toDouble)
    df.withColumn("_es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("_es_key").desc, col(idCol).asc)
      .limit(k)
      .drop("_es_key")
  }

  /** Per-GROUP weighted sample without replacement: the same A-ES
    * key as [[weightedTopK]], ranked WITHIN each group — the
    * per-domain / per-language weighted selection step ("the k
    * highest-drawn docs of every language, inclusion ∝ tokens").
    * One shuffle on the group key; the rank filter plans as
    * WindowGroupLimit, so per-group state stays bounded at k however
    * large (or skewed) a group is. Same determinism contract:
    * re-runs, repartitions, and engine swaps select identical rows.
    */
  def weightedTopKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val u = (hash60(col(idCol)).cast("double") + lit(1.0)) / lit(HashSpace.toDouble)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_es_key").desc, col(idCol).asc)
    df.withColumn("_es_key", log(u) / col(weightCol).cast("double"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .drop("_es_key")
  }

  /** Budget-driven mixture sampling: per-stratum keep-rate
    * min(1, budget*weight / stratum_tokens), so the kept token mass
    * approximates `budget` split by `weights`. Strata absent from
    * `weights` get weight 0 (dropped). The per-stratum totals are a
    * tiny broadcast dimension (one row per stratum); the keep
    * decision stays a narrow hash filter.
    */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, weights: Map[String, Double], budget: Double): DataFrame = {
    val wcol = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (stratum, wt)) =>
        when(col(strataCol) === stratum, lit(wt)).otherwise(acc)
    }
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokensCol)).cast("double").as("_stratum_tokens"))
    df.join(broadcast(totals), Seq(strataCol))
      .withColumn("_rate", least(lit(1.0), lit(budget) * wcol / col("_stratum_tokens")))
      .filter(hash60(col(idCol)).cast("double") / lit(HashSpace.toDouble) < col("_rate"))
      .drop("_rate", "_stratum_tokens")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") in exact integer
    * arithmetic: word bigrams hash into `buckets` feature buckets, the
    * target subset (`targetPred` rows) and the full corpus each get a
    * bucket-count profile, each bucket's weight is the add-1-smoothed
    * scaled ratio `((t+1)·10000) div (r+1)`, and a document's
    * importance is the sum of its bigram-occurrence bucket weights —
    * high when its n-gram profile looks like the target distribution.
    * Returns every input doc as (doc_id, importance); feed the scores
    * to [[weightedTopK]] / [[stratifiedBernoulli]] for the actual
    * resampling step.
    *
    * Scale shape: the bigram stream is ~tokens rows but aggregates to
    * `buckets` rows with map-side partial counts (the profiles never
    * shuffle raw bigrams); the weight table is a `buckets`-row
    * broadcast onto the stream; the only full-width shuffle is the
    * final doc-keyed score sum. Integer ratio weights, not log-space
    * floats, so scores are deterministic and oracle-checkable.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column, buckets: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreAgainstProfile(docs,
      bucketProfile(docs, targetPred, buckets, idCol, textCol),
      buckets, idCol, textCol)

  /** The (b, r, t) bigram-bucket count profile feeding
    * [[scoreAgainstProfile]]: r = corpus-wide occurrences hashing to
    * bucket b, t = occurrences from `targetPred` rows. Both counts
    * are plain sums, so profiles built per batch MERGE additively
    * (union + re-sum) to exactly the full-corpus profile — the
    * property the materialized serving twin
    * ([[graft.serving.ImportanceProfile]]) rests on. `buckets` rows.
    */
  def bucketProfile(docs: DataFrame, targetPred: Column, buckets: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def bucketed(d: DataFrame) = NearDup.spanGramsOf(d, 2, idCol, textCol)
      .select(graft.functions.Text.hashBucket(col("gram"), buckets).as("b"))
    val rawCnt = bucketed(docs).groupBy(col("b")).agg(count(lit(1)).as("r"))
    val tgtCnt = bucketed(docs.filter(targetPred)).groupBy(col("b")).agg(count(lit(1)).as("t"))
    rawCnt.join(tgtCnt, Seq("b"), "left_outer")
      .select(col("b"), col("r"), coalesce(col("t"), lit(0L)).as("t"))
  }

  /** Score `docs` against an already-built (b, r, t) profile —
    * weights derive from the counts at score time, so scoring against
    * an exactly-merged profile equals the one-shot
    * [[importanceWeights]] bit-for-bit.
    */
  def scoreAgainstProfile(docs: DataFrame, profile: DataFrame, buckets: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = profile.select(col("b"),
      expr("((t + 1L) * 10000L) DIV (r + 1L)").as("w"))
    val scores = NearDup.spanGramsOf(docs, 2, idCol, textCol)
      .select(col("doc_id"), graft.functions.Text.hashBucket(col("gram"), buckets).as("b"))
      .join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id")).agg(sum(col("w")).as("importance"))
    docs.select(col(idCol).as("doc_id"))
      .join(scores, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("importance"), lit(0L)).as("importance"))
  }
}
