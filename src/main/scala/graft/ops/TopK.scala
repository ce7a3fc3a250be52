package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K ranking operators — the reference's headline capability
  * (SURVEY §2.5): continuous per-key top-K (ProcessFunctions.kt:62-134),
  * per-window batch top-K (KafkaConsumerTopKJob.kt:243-291), the
  * generator's bounded min-heap oracle (DataGenerator.kt:98-128), and
  * the query-side ORDER BY ... LIMIT k (QueryService.kt:59-60).
  *
  * Rank semantics: 1-based positional rank after an explicit sort —
  * `row_number()`, not `rank()` (the reference has no gap semantics).
  * Tie-break is explicit (measure DESC, then key ASC) so results are
  * deterministic — SURVEY §7.4 flags reference tie-breaking as
  * sort-stability-dependent; we pin it down.
  *
  * Scale notes:
  *  - `topKGlobal` plans as partial-agg → shuffle → final-agg →
  *    TakeOrderedAndProject (per-partition bounded heap + driver merge
  *    of k rows) — the distributed analog of the reference's
  *    PriorityQueue min-heap. No global sort. The final row_number
  *    window runs over exactly k rows.
  *  - `topKPerKey` is one shuffle on the partition keys and a
  *    per-partition sort; WindowExec's rank filter `rn <= k` is pushed
  *    into a WindowGroupLimit (Spark 3.5+) so per-group state stays
  *    bounded at k — no group ever materializes fully sorted.
  */
object TopK {

  /** Global top-k rows of `df` grouped by `groupCols`, ranked by
    * `measure` (already-aggregated callers pass agg=identity).
    */
  def topKGlobal(
      aggregated: DataFrame,
      order: Seq[Column],
      k: Int): DataFrame = {
    val top = aggregated.orderBy(order: _*).limit(k)
    // rank over k rows only — single tiny partition, intentional.
    top.withColumn("rank", row_number().over(Window.orderBy(order: _*)))
  }

  /** Per-key top-k: rank within each `partCols` group by `order`,
    * keep rank <= k. The distributed analog of
    * calculateTopKPerRestaurant (KafkaConsumerTopKJob.kt:243-272).
    */
  def topKPerKey(
      df: DataFrame,
      partCols: Seq[String],
      order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Query-side top-K lookup (EP1 semantics, QueryService.kt:43-61):
    * filter a precomputed ranked table by time range + rank<=k, order
    * by window desc then rank asc. Plans as TakeOrderedAndProject when
    * a limit is applied by the caller.
    */
  def topKLookup(
      ranked: DataFrame,
      windowCol: String,
      startMs: Long,
      endMs: Long,
      k: Int): DataFrame =
    ranked
      .filter(col(windowCol) >= startMs && col(windowCol) < endMs && col("rank") <= k)
      .orderBy(col(windowCol).desc, col("rank").asc)
}
