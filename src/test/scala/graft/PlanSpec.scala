package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{EventQueries, ServingQueries, TpchQueries}

/** Physical-plan regression guards — the scale-design claims, held in
  * place: pruning reaches the scans, per-group rank state is bounded,
  * small sides broadcast, global top-K never does a global sort.
  */
class PlanSpec extends SparkSuite {

  private def planOf(df: DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("serving lookup: partition pruning + pushed filters + pruned columns") {
    val p = planOf(ServingQueries.topKLookupServed(spark, sfDir))
    assert(p.contains("PartitionFilters: [isnotnull(p_date"), p)
    assert(p.contains("GreaterThanOrEqual(window_start_ms"), p)
    assert(p.contains("LessThanOrEqual(rank") || p.contains("IsNotNull(rank"), p)
    assert(!p.contains("w_ts"), "layout helper column must be pruned from the scan\n" + p)
  }

  test("per-window top-K: rank filter becomes a partial+final WindowGroupLimit") {
    val p = planOf(EventQueries.topKWindowed(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
    assert(!p.contains("props"), "events scan must prune unused columns\n" + p)
  }

  test("dim join: broadcast hash join + partial aggregation before the shuffle") {
    val p = planOf(TpchQueries.queries("q_tpch_brand_revenue")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("global top-K: TakeOrderedAndProject, no global Sort of the aggregate") {
    val p = planOf(EventQueries.topKGlobalRevenue(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("first-wins dedup: partial WindowGroupLimit prunes to 1 row/key before the shuffle") {
    val p = planOf(EventQueries.dedupEvents(spark, sfDir))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("row_number(), 1, Partial"), p)
    assert(finalPlan.contains("row_number(), 1, Final"), p)
  }

  test("rollup: map-side partial aggregation, bounded shuffle count") {
    val p = planOf(EventQueries.rollup1m(spark, sfDir))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("partial_count") || finalPlan.contains("partial_sum"), p)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(shuffles <= 2,
      s"rollup should shuffle at most twice (agg + exact-distinct expand), got $shuffles\n" + p)
  }
}
