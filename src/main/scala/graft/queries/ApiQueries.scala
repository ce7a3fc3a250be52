package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.TopKApi
import graft.serving.Serving

/** Gate entries exercising the query-API façade end-to-end: defaults
  * (now-1h/now, k=10), the "all" global sentinel, and per-restaurant
  * routing with an explicit range.
  */
object ApiQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Global top-k with ALL defaults — the controller's bare GET. */
  def apiTopkGlobal(spark: SparkSession, dir: String): DataFrame =
    TopKApi.topk(spark, dir)

  /** Per-restaurant top-3 by count over the last 24 h. */
  def apiTopkRestaurant(spark: SparkSession, dir: String): DataFrame = {
    val now = Serving.anchorMs(spark, dir)
    TopKApi.topk(spark, dir, restaurantId = "click",
      fromMs = Some(now - 24L * Serving.hourMs), toMs = Some(now), k = 3)
  }

  /** Per-restaurant revenue path: flat top-10 by revenue, last 72 h. */
  def apiTopkRevenue(spark: SparkSession, dir: String): DataFrame = {
    val now = Serving.anchorMs(spark, dir)
    TopKApi.topk(spark, dir, restaurantId = "click",
      fromMs = Some(now - 72L * Serving.hourMs), toMs = Some(now),
      k = 10, byRevenue = true)
  }

  /** Distinct users, ALL defaults (last hour, global) — served from
    * the minute-grain distinct-user state.
    */
  def apiDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    TopKApi.distinctUsers(spark, dir)

  /** EXACT distinct users, default last-3-days global — served from
    * the replica-routed day-grain bitmap state; the oracle is a raw
    * COUNT(DISTINCT) rescan, no tolerance band.
    */
  def apiDistinctExact(spark: SparkSession, dir: String): DataFrame =
    TopKApi.distinctUsersExact(spark, dir)

  /** Order-value percentiles, last 24 h global — served from the
    * minute-grain histogram state.
    */
  def apiPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val now = Serving.anchorMs(spark, dir)
    TopKApi.percentiles(spark, dir,
      fromMs = Some(now - 24L * Serving.hourMs), toMs = Some(now))
  }

  /** Arbitrary-p quantiles at three NON-default per-mille points
    * (p12.5 / p37.5 / p97.5 — none representable by the fixed-bin
    * p50/90/99 route), last 24 h global, served from the exact
    * value-grain state. The oracle recomputes the same order
    * statistics from raw events, so the gate proves the served
    * quantile(p) EXACT at p values the histogram route cannot even
    * express.
    */
  def apiQuantile(spark: SparkSession, dir: String): DataFrame = {
    val now = Serving.anchorMs(spark, dir)
    TopKApi.quantile(spark, dir, pPerMille = Seq(125L, 375L, 975L),
      fromMs = Some(now - 24L * Serving.hourMs), toMs = Some(now))
  }

  /** Sketch quantiles at the same non-default p values, last 24 h
    * global — served from the hard-bounded integer log-histogram.
    * The oracle mirrors the integer bucket/edge math from raw events,
    * so the 6.25%-relative-error ESTIMATES themselves are hash-exact
    * cross-engine (the DDSketch determinism claim, checked).
    */
  def apiQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val now = Serving.anchorMs(spark, dir)
    TopKApi.quantileApprox(spark, dir, pPerMille = Seq(125L, 975L),
      fromMs = Some(now - 24L * Serving.hourMs), toMs = Some(now))
  }

  /** The PER-TYPE arm of the sketch-quantile route — the tenant
    * filter ([[TopKApi.quantileApprox]]'s restaurantId) applied to
    * the loghist state, which carries event_type precisely so
    * grouped quantiles serve without a per-group state table. The
    * gate SWEEPS the whole arm: every event type × three per-mille
    * points, one routed call per type (the controller's fan-out),
    * unioned — so the per-type bucket math is exercised across the
    * full alphabet, not a single (type, p) cell. The type alphabet
    * is a bounded driver-side collect (the same alphabet the serving
    * state is keyed on).
    */
  def apiQuantileSketchTyped(spark: SparkSession, dir: String): DataFrame = {
    val now = Serving.anchorMs(spark, dir)
    TopKApi.quantileApproxAllTypes(spark, dir,
      pPerMille = Seq(125L, 500L, 975L),
      fromMs = Some(now - 24L * Serving.hourMs), toMs = Some(now))
  }

  val queries: Map[String, QFn] = Map(
    "q_api_quantile_typed" -> (apiQuantileSketchTyped _),
    "q_api_topk_global" -> (apiTopkGlobal _),
    "q_api_topk_restaurant" -> (apiTopkRestaurant _),
    "q_api_topk_revenue" -> (apiTopkRevenue _),
    "q_api_distinct_users" -> (apiDistinctUsers _),
    "q_api_distinct_exact" -> (apiDistinctExact _),
    "q_api_percentiles" -> (apiPercentiles _),
    "q_api_quantile" -> (apiQuantile _),
    "q_api_quantile_sketch" -> (apiQuantileSketch _),
  )

  private val cents = "CAST(round(value*100) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    // minute-window overlap with the default now-1h/now range; the
    // served path reads state, the oracle rescans raw — equal counts
    "q_api_distinct_users" ->
      """WITH r AS (SELECT epoch_ms(max(ts)) AS to_ms,
        |               epoch_ms(max(ts)) - 3600*1000 AS from_ms FROM events)
        |SELECT 'all' AS restaurant_id, r.from_ms, r.to_ms,
        |  (SELECT count(DISTINCT user_id) FROM events, r
        |   WHERE epoch_ms(date_trunc('minute', ts)) < r.to_ms
        |     AND epoch_ms(date_trunc('minute', ts)) + 60000 > r.from_ms) AS distinct_users
        |FROM r""".stripMargin,
    // day-window overlap with the default now-3d/now range; the
    // served bitmap path is exact, so the oracle is a plain raw
    // COUNT(DISTINCT) over the overlapping days
    "q_api_distinct_exact" ->
      """WITH r AS (SELECT epoch_ms(max(ts)) AS to_ms,
        |               epoch_ms(max(ts)) - 3*86400000 AS from_ms FROM events)
        |SELECT 'all' AS restaurant_id, r.from_ms, r.to_ms,
        |  (SELECT count(DISTINCT user_id) FROM events, r
        |   WHERE epoch_ms(date_trunc('day', ts)) < r.to_ms
        |     AND epoch_ms(date_trunc('day', ts)) + 86400000 > r.from_ms)
        |    AS distinct_users
        |FROM r""".stripMargin,
    // minute-window-overlap 24h range, binned-quantile integer form
    // (the q_percentile_served definition with explicit [from, to))
    "q_api_percentiles" ->
      s"""WITH r AS (SELECT epoch_ms(max(ts)) AS to_ms,
         |               epoch_ms(max(ts)) - 24*3600*1000 AS from_ms FROM events),
         |f AS (
         |  SELECT $cents // 100 AS bin FROM events, r
         |  WHERE epoch_ms(date_trunc('minute', ts)) < r.to_ms
         |    AND epoch_ms(date_trunc('minute', ts)) + 60000 > r.from_ms),
         |h AS (SELECT bin, count(*) AS c FROM f GROUP BY 1),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
         |cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h),
         |sel AS (
         |  SELECT p.p, CAST(min(cum.bin)*100 AS BIGINT) AS est
         |  FROM cum CROSS JOIN t CROSS JOIN (VALUES (50), (90), (99)) AS p(p)
         |  WHERE cum.cum * 100 >= p.p * t.n GROUP BY 1)
         |SELECT 'all' AS restaurant_id, r.from_ms, r.to_ms, t.n,
         |  (SELECT est FROM sel WHERE p = 50) AS p50_cents,
         |  (SELECT est FROM sel WHERE p = 90) AS p90_cents,
         |  (SELECT est FROM sel WHERE p = 99) AS p99_cents
         |FROM r, t""".stripMargin,
    // exact order statistics at per-mille p over the true value
    // multiset: `min v : cum(v)*1000 >= p*n` — the served value-grain
    // state must reproduce a raw rescan bit-for-bit
    "q_api_quantile" ->
      s"""WITH r AS (SELECT epoch_ms(max(ts)) AS to_ms,
         |               epoch_ms(max(ts)) - 24*3600*1000 AS from_ms FROM events),
         |f AS (
         |  SELECT $cents AS v FROM events, r
         |  WHERE epoch_ms(date_trunc('minute', ts)) < r.to_ms
         |    AND epoch_ms(date_trunc('minute', ts)) + 60000 > r.from_ms),
         |h AS (SELECT v, count(*) AS c FROM f GROUP BY 1),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
         |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
         |sel AS (
         |  SELECT p.p, CAST(min(cum.v) AS BIGINT) AS est
         |  FROM cum CROSS JOIN t CROSS JOIN (VALUES (125), (375), (975)) AS p(p)
         |  WHERE cum.cum * 1000 >= p.p * t.n GROUP BY 1)
         |SELECT 'all' AS restaurant_id, r.from_ms, r.to_ms, t.n,
         |  (SELECT est FROM sel WHERE p = 125) AS p125_cents,
         |  (SELECT est FROM sel WHERE p = 375) AS p375_cents,
         |  (SELECT est FROM sel WHERE p = 975) AS p975_cents
         |FROM r, t""".stripMargin,
    // the integer log-histogram (DDSketch-shaped) estimates, mirrored
    // bucket-for-bucket: b = (floor(log2 v)-4)*16 + (v >> (floor(log2
    // v)-4)) via length(bin(v)) — pure integer/string ops identical in
    // both engines; estimate = bucket lower edge
    // the typed arm, swept over the FULL type alphabet × three p
    // values: identical per-type bucket math, one row per type; a
    // type with no in-range rows mirrors the route's n=0/NULL
    // envelope via the LEFT JOIN
    "q_api_quantile_typed" ->
      s"""WITH r AS (SELECT epoch_ms(max(ts)) AS to_ms,
         |               epoch_ms(max(ts)) - 24*3600*1000 AS from_ms FROM events),
         |types AS (SELECT DISTINCT event_type FROM events),
         |f AS (
         |  SELECT event_type, $cents AS v FROM events, r
         |  WHERE epoch_ms(date_trunc('minute', ts)) < r.to_ms
         |    AND epoch_ms(date_trunc('minute', ts)) + 60000 > r.from_ms),
         |bkt AS (SELECT event_type, CASE WHEN v < 16 THEN v
         |  ELSE ((length(bin(v))-5)*16 + (v >> (length(bin(v))-5))) END AS b FROM f),
         |h AS (SELECT event_type, b, count(*) AS c FROM bkt GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
         |cum AS (SELECT event_type, b,
         |  sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum FROM h),
         |sel AS (
         |  SELECT cum.event_type, p.p, CAST(min(CASE WHEN cum.b < 16 THEN cum.b
         |    ELSE (cum.b - (cum.b//16 - 1)*16) * (CAST(1 AS BIGINT) << (cum.b//16 - 1)) END)
         |    AS BIGINT) AS est
         |  FROM cum JOIN t ON t.event_type = cum.event_type
         |  CROSS JOIN (VALUES (125), (500), (975)) AS p(p)
         |  WHERE cum.cum * 1000 >= p.p * t.n GROUP BY 1, 2)
         |SELECT ty.event_type AS restaurant_id, r.from_ms, r.to_ms,
         |  CAST(COALESCE(t.n, 0) AS BIGINT) AS n,
         |  (SELECT est FROM sel WHERE sel.event_type = ty.event_type AND p = 125) AS p125_cents_est,
         |  (SELECT est FROM sel WHERE sel.event_type = ty.event_type AND p = 500) AS p500_cents_est,
         |  (SELECT est FROM sel WHERE sel.event_type = ty.event_type AND p = 975) AS p975_cents_est
         |FROM types ty CROSS JOIN r LEFT JOIN t ON t.event_type = ty.event_type""".stripMargin,
    "q_api_quantile_sketch" ->
      s"""WITH r AS (SELECT epoch_ms(max(ts)) AS to_ms,
         |               epoch_ms(max(ts)) - 24*3600*1000 AS from_ms FROM events),
         |f AS (
         |  SELECT $cents AS v FROM events, r
         |  WHERE epoch_ms(date_trunc('minute', ts)) < r.to_ms
         |    AND epoch_ms(date_trunc('minute', ts)) + 60000 > r.from_ms),
         |bkt AS (SELECT CASE WHEN v < 16 THEN v
         |  ELSE ((length(bin(v))-5)*16 + (v >> (length(bin(v))-5))) END AS b FROM f),
         |h AS (SELECT b, count(*) AS c FROM bkt GROUP BY 1),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
         |cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cum FROM h),
         |sel AS (
         |  SELECT p.p, CAST(min(CASE WHEN cum.b < 16 THEN cum.b
         |    ELSE (cum.b - (cum.b//16 - 1)*16) * (CAST(1 AS BIGINT) << (cum.b//16 - 1)) END)
         |    AS BIGINT) AS est
         |  FROM cum CROSS JOIN t CROSS JOIN (VALUES (125), (975)) AS p(p)
         |  WHERE cum.cum * 1000 >= p.p * t.n GROUP BY 1)
         |SELECT 'all' AS restaurant_id, r.from_ms, r.to_ms, t.n,
         |  (SELECT est FROM sel WHERE p = 125) AS p125_cents_est,
         |  (SELECT est FROM sel WHERE p = 975) AS p975_cents_est
         |FROM r, t""".stripMargin,
    "q_api_topk_global" ->
      s"""SELECT 'all' AS restaurant_id, window_start_ms,
         |  window_start_ms + 3600*1000 AS window_end_ms,
         |  CAST(rnk AS BIGINT) AS rank, user_id, order_count, total_cents FROM (
         |  SELECT window_start_ms, user_id, order_count, total_cents,
         |    row_number() OVER (PARTITION BY window_start_ms
         |      ORDER BY order_count DESC, total_cents DESC, user_id ASC) AS rnk
         |  FROM (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, user_id,
         |          count(*) AS order_count, CAST(SUM($cents) AS BIGINT) AS total_cents
         |        FROM events GROUP BY 1, 2))
         |WHERE rnk <= 10
         |  AND window_start_ms < (SELECT epoch_ms(max(ts)) FROM events)
         |  AND window_start_ms + 3600*1000 > (SELECT epoch_ms(max(ts)) - 3600*1000 FROM events)
         |ORDER BY window_start_ms DESC, rnk ASC""".stripMargin,
    "q_api_topk_restaurant" ->
      s"""SELECT event_type AS restaurant_id, window_start_ms,
         |  window_start_ms + 3600*1000 AS window_end_ms,
         |  CAST(rnk AS BIGINT) AS rank, user_id, order_count, total_cents FROM (
         |  SELECT event_type, window_start_ms, user_id, order_count, total_cents,
         |    row_number() OVER (PARTITION BY window_start_ms, event_type
         |      ORDER BY order_count DESC, total_cents DESC, user_id ASC) AS rnk
         |  FROM (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type, user_id,
         |          count(*) AS order_count, CAST(SUM($cents) AS BIGINT) AS total_cents
         |        FROM events GROUP BY 1, 2, 3))
         |WHERE rnk <= 3 AND event_type = 'click'
         |  AND window_start_ms < (SELECT epoch_ms(max(ts)) FROM events)
         |  AND window_start_ms + 3600*1000 > (SELECT epoch_ms(max(ts)) - 24*3600*1000 FROM events)
         |ORDER BY window_start_ms DESC, rnk ASC""".stripMargin,
    "q_api_topk_revenue" ->
      s"""SELECT event_type AS restaurant_id, window_start_ms,
         |  window_start_ms + 3600*1000 AS window_end_ms,
         |  CAST(rnk AS BIGINT) AS rank, user_id, order_count, total_cents FROM (
         |  SELECT event_type, window_start_ms, user_id, order_count, total_cents,
         |    row_number() OVER (PARTITION BY window_start_ms, event_type
         |      ORDER BY total_cents DESC, order_count DESC, user_id ASC) AS rnk
         |  FROM (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type, user_id,
         |          count(*) AS order_count, CAST(SUM($cents) AS BIGINT) AS total_cents
         |        FROM events GROUP BY 1, 2, 3))
         |WHERE rnk <= 10 AND event_type = 'click'
         |  AND window_start_ms < (SELECT epoch_ms(max(ts)) FROM events)
         |  AND window_start_ms + 3600*1000 > (SELECT epoch_ms(max(ts)) - 72*3600*1000 FROM events)
         |ORDER BY total_cents DESC, window_end_ms DESC, user_id ASC LIMIT 10""".stripMargin,
  )
}
