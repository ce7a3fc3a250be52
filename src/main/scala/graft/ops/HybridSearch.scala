package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.
  * SIGIR'09) of independently-ranked result legs, the standard way a
  * retrieval stack combines sparse lexical ([[SparseSearch]]) and
  * dense vector ([[Ann]]) candidates without comparable raw scores:
  * fused(d) = Σ_legs 1/(k₀ + rank_leg(d)), k₀ = 60.
  *
  * Integer-exact twist (the repo-wide policy — no FP sum whose
  * addend order could flip a rank): scores are scaled by
  * P = lcm(61…70), so every addend P/(k₀+r) is an EXACT integer for
  * ranks ≤ 10 and the fused ordering is bit-reproducible in any
  * engine. Ties break to the lower id.
  *
  * Scale shape: fusion is one keyed groupBy over the unioned legs
  * (map-side combine; per-query state bounded by Σ leg-k), then a
  * WindowGroupLimit per-query top-k — no join between legs at all,
  * so adding a third leg (e.g. a recency or quality ranker) is
  * another union input, not another shuffle.
  */
object HybridSearch {

  /** Standard RRF smoothing constant. */
  val RrfK = 60

  /** lcm(61…70): P div (60+r) is exact for every rank r ≤ 10. */
  val RrfScale = 142813628717760L

  val MaxRank = 10

  /** Fuse ranked legs, each shaped (query_id, id, rank) with
    * rank ∈ [1, [[MaxRank]]] (deeper ranks are clamped to MaxRank's
    * addend — deterministic, monotone, and still integer-exact).
    * Output: (query_id, rank, id, rrf_scaled, n_legs) — n_legs says
    * how many legs surfaced the id (the consensus signal hybrid
    * search exists for).
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int): DataFrame = {
    require(legs.nonEmpty, "need at least one ranked leg")
    val u = legs.map(_.select(col("query_id"), col("id"), col("rank")))
      .reduce(_ unionByName _)
    val scored = u
      .groupBy(col("query_id"), col("id"))
      .agg(sum(expr(s"$RrfScale div ($RrfK + least(rank, $MaxRank))"))
        .as("rrf_scaled"),
        count(lit(1)).as("n_legs"))
    TopK.topKPerKey(scored, Seq("query_id"),
        Seq(col("rrf_scaled").desc, col("id").asc), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id"), col("rrf_scaled"), col("n_legs"))
  }
}
