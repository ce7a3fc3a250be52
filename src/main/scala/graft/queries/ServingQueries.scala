package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.serving.Serving

/** Serving-path lookups — read the materialized ranked tables instead
  * of recomputing the pipeline (QueryService.kt:43-129 semantics; see
  * [[graft.serving.Serving]]). These are the entries the ≤200 ms warm
  * latency bar applies to: a pruned scan of a small sorted parquet
  * table plus a broadcast of the 1-row anchor.
  */
object ServingQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val hourMs = Serving.hourMs

  /** Count-path lookup (EP1): last 72 h of per-window top-3 by order
    * count from the materialized table, window desc / rank asc.
    */
  def topKLookupServed(spark: SparkSession, dir: String): DataFrame = {
    val t0 = Serving.anchorMs(spark, dir) - 72L * hourMs
    Serving.readTable(spark, dir, "topk_by_count")
      .filter(col("p_date") >= Serving.utcDate(t0) && // directory pruning
        col("window_start_ms") >= t0 && col("rank") <= 3)
      .select(col("window_start_ms"), col("rank"), col("user_id"),
        col("order_count"), col("total_cents"))
      // k×windows rows — a global orderBy would add a range-partition
      // SAMPLING pass (reads the data twice); one post-filter
      // partition sorts the same rows in one stage.
      .coalesce(1)
      .sortWithinPartitions(col("window_start_ms").desc, col("rank").asc)
  }

  /** Revenue-path lookup (QueryService.kt:99-129): top-10 entries
    * across the last 72 h ordered by revenue desc then window end
    * desc (user asc tie-break pinned for determinism).
    */
  def topKLookupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t0 = Serving.anchorMs(spark, dir) - 72L * hourMs
    Serving.readTable(spark, dir, "topk_by_revenue")
      .filter(col("p_date") >= Serving.utcDate(t0) && // directory pruning
        col("window_start_ms") >= t0)
      .select(col("window_start_ms"),
        (col("window_start_ms") + lit(hourMs)).as("window_end_ms"),
        col("user_id"), col("order_count"), col("total_cents"))
      .orderBy(col("total_cents").desc, col("window_end_ms").desc, col("user_id").asc)
      .limit(10)
  }

  /** Grain-routed daily aggregate ([[graft.serving.Router]]): the day
    * grain divides the hour, so this reads the materialized hourly agg
    * table (~1/3600 of the raw rows) and re-aggregates — hash-checked
    * against the raw-events oracle, proving the route lossless.
    */
  def routedDaily(spark: SparkSession, dir: String): DataFrame =
    graft.serving.Router.aggregateByType(spark, dir, grainMs = 24L * hourMs)

  /** Hybrid offline+realtime serving ([[graft.serving.Router
    * .hybridHourlyByType]]): complete hours from the rollup, the
    * in-flight hour from raw; hash-equality with the pure-raw oracle
    * proves the seam neither double-counts nor gaps.
    */
  def hybridHourly(spark: SparkSession, dir: String): DataFrame =
    graft.serving.Router.hybridHourlyByType(spark, dir)

  /** Incremental CUMULATE ([[graft.serving.Router
    * .cumulateDailyFromHourly]]): expanding daily windows folded
    * forward from the hourly serving agg. Hash-checked against the
    * same raw-expand oracle as `q_cumulate_daily`, proving the
    * rollup-fed form exact.
    */
  def cumulateDailyRouted(spark: SparkSession, dir: String): DataFrame =
    graft.serving.Router.cumulateDailyFromHourly(spark, dir)

  val queries: Map[String, QFn] = Map(
    "q_topk_lookup_served" -> (topKLookupServed _),
    "q_topk_lookup_revenue" -> (topKLookupRevenue _),
    "q_routed_daily" -> (routedDaily _),
    "q_hybrid_hourly" -> (hybridHourly _),
    "q_cumulate_daily_routed" -> (cumulateDailyRouted _),
  )

  private val cents = "CAST(round(value*100) AS BIGINT)"

  /** Oracles recompute the same ranked tables from raw events in SQL,
    * so the materialized path is checked end-to-end (build + read).
    */
  val oracles: Map[String, String] = Map(
    // the routed form must match the RAW-expand oracle bit-for-bit —
    // same SQL as q_cumulate_daily, different (serving-table) plan
    "q_cumulate_daily_routed" -> OlapQueries.oracles("q_cumulate_daily"),
    "q_routed_daily" ->
      s"""SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_hybrid_hourly" ->
      s"""SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_topk_lookup_served" ->
      s"""SELECT window_start_ms, CAST(rnk AS BIGINT) AS rank, user_id, order_count, total_cents FROM (
         |  SELECT window_start_ms, user_id, order_count, total_cents,
         |    row_number() OVER (PARTITION BY window_start_ms
         |      ORDER BY order_count DESC, total_cents DESC, user_id ASC) AS rnk
         |  FROM (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, user_id,
         |          count(*) AS order_count, CAST(SUM($cents) AS BIGINT) AS total_cents
         |        FROM events GROUP BY 1, 2))
         |WHERE rnk <= 3
         |  AND window_start_ms >= (SELECT epoch_ms(max(ts)) - 72*3600*1000 FROM events)
         |ORDER BY window_start_ms DESC, rnk ASC""".stripMargin,
    "q_topk_lookup_revenue" ->
      s"""SELECT window_start_ms, window_start_ms + 3600*1000 AS window_end_ms,
         |  user_id, order_count, total_cents FROM (
         |  SELECT window_start_ms, user_id, order_count, total_cents,
         |    row_number() OVER (PARTITION BY window_start_ms
         |      ORDER BY total_cents DESC, order_count DESC, user_id ASC) AS rnk
         |  FROM (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, user_id,
         |          count(*) AS order_count, CAST(SUM($cents) AS BIGINT) AS total_cents
         |        FROM events GROUP BY 1, 2))
         |WHERE rnk <= 10
         |  AND window_start_ms >= (SELECT epoch_ms(max(ts)) - 72*3600*1000 FROM events)
         |ORDER BY total_cents DESC, window_end_ms DESC, user_id ASC LIMIT 10""".stripMargin,
  )
}
