package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.serving.Serving

/** Query-API façade — the reference's REST surface re-expressed as a
  * library call (TopKController.kt:34-38, QueryService.kt:43-129).
  *
  * Parameter semantics match the reference:
  *  - `fromMs`/`toMs` default to now-1h / now (the controller's
  *    relative defaults); "now" on static data is the dataset's max
  *    event ts (the anchor the serving layer stores).
  *  - `k` defaults to 10 and is capped at [[Serving.K]] — the ranks
  *    the serving tables materialize.
  *  - `restaurantId = "all"` (case-insensitive, TopKController.kt:108)
  *    routes to the global table; anything else filters the keyed
  *    table (QueryService.kt:105's per-restaurant vs global routing).
  *    Output rows carry `restaurant_id` — the literal `"all"` for
  *    global results, mirroring the reference's ALL-sentinel rows
  *    (ProcessFunctions.kt:117-132).
  *  - `byRevenue = false` → per-window rank-by-count rows, window
  *    desc / rank asc (QueryService.kt:43-61);
  *    `byRevenue = true`  → flat top-k across the range by revenue
  *    desc, window end desc (QueryService.kt:99-129).
  *
  * A window is in range when it OVERLAPS [from, to) — the default
  * 1-hour range therefore returns the in-progress window plus the
  * previous one, which is what a "last hour" dashboard wants.
  * Every call is a single pruned scan of a materialized table.
  */
object TopKApi {

  val All = "all"

  private val hourMs = Serving.hourMs

  def topk(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None,
      k: Int = 10,
      byRevenue: Boolean = false): DataFrame = {
    require(k >= 1 && k <= Serving.K, s"k must be in [1, ${Serving.K}], got $k")
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    require(from < to, s"empty range [$from, $to)")
    // ids are normalized to lowercase for BOTH the "all" sentinel and
    // the keyed filter (the reference lowercases its routing check,
    // TopKController.kt:108; table keys are lowercase) — a caller
    // passing "Click" gets "click", not silently zero rows.
    val rid = restaurantId.toLowerCase(java.util.Locale.ROOT)
    val global = rid == All
    val ordering = if (byRevenue) "revenue" else "count"
    val table = if (global) s"topk_by_$ordering" else s"topk_keyed_by_$ordering"
    // every API call routes through the replica set, pinned by its
    // tenant (here: the restaurant id) — the reference's replica-group
    // routing applies to EVERY query class, and copies are identical,
    // so routing never changes a result (ApiSpec proves copy-equality)
    val scan = graft.serving.ReplicaRouter.table(spark, dataDir, table, tenant = rid)
    val routed =
      if (global) scan.withColumn("restaurant_id", lit(All))
      else scan.filter(col("event_type") === rid)
        .withColumnRenamed("event_type", "restaurant_id")
    val inRange = routed
      // two-sided directory pruning: a historical [from, to) scans
      // only its own day directories, not everything up to present
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + hourMs > from)
      .select(col("restaurant_id"), col("window_start_ms"),
        (col("window_start_ms") + hourMs).as("window_end_ms"),
        col("rank"), col("user_id"), col("order_count"), col("total_cents"))
    if (byRevenue)
      // Flat revenue top-k over the stored per-window top-K rows; the
      // true global top-k rows all have window-rank <= k <= K, so the
      // serving table loses nothing.
      inRange
        .orderBy(col("total_cents").desc, col("window_end_ms").desc, col("user_id").asc)
        .limit(k)
    else
      // serving result is k×windows rows — sort in one partition
      // rather than paying a range-partitioning sampling pass.
      inRange.filter(col("rank") <= k)
        .coalesce(1)
        .sortWithinPartitions(col("window_start_ms").desc, col("rank").asc)
  }

  /** Distinct-users endpoint — the API-shaped companion to the topk
    * routes (same defaults, sentinel, and lowercase routing): how
    * many distinct users were active in [from, to)? Served from the
    * MINUTE-GRAIN distinct-user state (`rollup_1m_users` — the
    * DISTINCTCOUNT query a Pinot rollup table answers from its
    * sketch/user column), never a raw-event scan; range semantics
    * are minute-window overlap, the minute-grain analog of topk's
    * hour-window overlap.
    */
  def distinctUsers(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    require(from < to, s"empty range [$from, $to)")
    val rid = restaurantId.toLowerCase(java.util.Locale.ROOT)
    val st = graft.serving.ReplicaRouter.table(
      spark, dataDir, "rollup_1m_users", tenant = rid)
    val keyed = if (rid == All) st else st.filter(col("event_type") === rid)
    keyed
      // two-sided directory pruning: an explicit historical range
      // must not scan every day directory up to the present
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + 60000L > from)
      .agg(countDistinct(col("user_id")).as("distinct_users"))
      .select(lit(rid).as("restaurant_id"), lit(from).as("from_ms"),
        lit(to).as("to_ms"), col("distinct_users"))
  }

  /** EXACT distinct-users endpoint — the no-error-bar upgrade of
    * [[distinctUsers]] for day-grain ranges, answered from the
    * replica-routed `bitmap_daily` state
    * ([[graft.functions.BitmapDistinct]], Pinot's
    * DISTINCTCOUNTBITMAP serving shape): the overlapping day
    * bitmaps OR-merge into exactly the range's user set, so the
    * count equals a raw rescan at any scale while reading only ≤
    * range-days × types pruned state rows. Default range: the last
    * 3 days. Same envelope/sentinel/routing contract as the other
    * routes, including the one-row empty-range envelope (a global
    * aggregate always yields its row; an empty merge counts 0).
    */
  def distinctUsersExact(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    import graft.functions.BitmapDistinct
    val dayMs = 24L * hourMs
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - 3L * dayMs)
    require(from < to, s"empty range [$from, $to)")
    val rid = restaurantId.toLowerCase(java.util.Locale.ROOT)
    val st = graft.serving.ReplicaRouter.table(
      spark, dataDir, "bitmap_daily", tenant = rid)
    val keyed = if (rid == All) st else st.filter(col("event_type") === rid)
    keyed
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + dayMs > from)
      .agg(BitmapDistinct.bitmapMerge(col("bm")).as("bm"))
      .select(lit(rid).as("restaurant_id"), lit(from).as("from_ms"),
        lit(to).as("to_ms"),
        BitmapDistinct.cardinality(col("bm")).as("distinct_users"))
  }

  /** Percentiles endpoint — order-value p50/p90/p99 for [from, to)
    * with the same defaults/sentinel/routing as the other routes,
    * answered from the minute-grain value HISTOGRAM state
    * (`rollup_1m_hist`, the PERCENTILEEST serving shape): bins
    * re-merge additively for any range, the estimate is the lower
    * edge of the first bin whose cumulative count reaches p% (exact
    * integer form `100·cum >= p·n`). Bin re-aggregation is bounded
    * (occupied bins), so the cumsum is a final step over a tiny
    * frame, never a fact scan.
    */
  def percentiles(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    require(from < to, s"empty range [$from, $to)")
    val rid = restaurantId.toLowerCase(java.util.Locale.ROOT)
    val st = graft.serving.ReplicaRouter.table(
      spark, dataDir, "rollup_1m_hist", tenant = rid)
    val keyed = if (rid == All) st else st.filter(col("event_type") === rid)
    val rows = keyed
      // two-sided directory pruning (see distinctUsers)
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + 60000L > from)
      .select(col("bin"), col("cnt"))
    // ONE window stage computes everything — a groupBy(bin) → cumsum
    // → per-p groupBy → pivot chain is 6 scheduled stages of ~40 ms
    // each on a ~1k-row frame (measured ~300 ms/call; stage count,
    // not data, was the cost). The default RANGE frame makes same-bin
    // rows share the through-bin running total, so the bin-collapse
    // groupBy is redundant: the first row whose shared cum crosses
    // p%·n sits in exactly the crossing bin. The single-partition
    // sort is over the occupied state rows in range — the same
    // bounded frame the cumsum always needed.
    val w = Window.orderBy(col("bin"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def estAt(p: Long) = min(when(
      col("cum") * 100 >= lit(p) * col("n"),
      col("bin") * lit(Serving.histBinCents))).over(full)
    val est = rows
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(full))
      .withColumn("p50_cents", estAt(50))
      .withColumn("p90_cents", estAt(90))
      .withColumn("p99_cents", estAt(99))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n"), col("p50_cents"), col("p90_cents"), col("p99_cents"))
    // envelope contract (exactly ONE row, n=0/NULL pcts over an empty
    // range) via union + priority-take: a left join against the 0-or-
    // 1-row frame would BROADCAST a subquery — a separate job worth
    // ~100 ms of pure latency on a serving route (measured)
    val empty = spark.range(1).select(lit(0L).as("n"),
      lit(null).cast("long").as("p50_cents"),
      lit(null).cast("long").as("p90_cents"),
      lit(null).cast("long").as("p99_cents"))
    est.withColumn("pri", lit(0))
      .unionByName(empty.withColumn("pri", lit(1)))
      .orderBy(col("pri")).limit(1)
      .select(lit(rid).as("restaurant_id"), lit(from).as("from_ms"),
        lit(to).as("to_ms"), col("n"),
        col("p50_cents"), col("p90_cents"), col("p99_cents"))
  }

  /** Arbitrary-p quantile endpoint — `quantile(p, from, to)` for ANY
    * per-mille p list, served from the minute-grain EXACT value
    * state (`rollup_1m_vals`, [[Serving.minuteValueVals]]). Unlike
    * [[percentiles]] (fixed $1 bins, estimates snap to bin edges),
    * this answers from one row per occupied value, so the result is
    * the exact order statistic `min v : cum(v)·1000 >= p·n` over the
    * true value multiset — no bin-resolution cliff at any p. The
    * range re-aggregation is additive (counts re-sum), the cumsum
    * runs over the bounded occupied-value frame (domain-bounded,
    * never a fact scan), and the route keeps the envelope contract:
    * one row per call, NULL quantiles over a data-free range.
    * Output pivots one `p<ppm>_cents` column per requested p.
    */
  def quantile(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      pPerMille: Seq[Long] = Seq(500L),
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pPerMille.nonEmpty && pPerMille.forall(p => p >= 1 && p <= 1000),
      s"per-mille p values must be in [1, 1000], got $pPerMille")
    require(pPerMille.distinct == pPerMille,
      s"duplicate p values: $pPerMille")
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    require(from < to, s"empty range [$from, $to)")
    val rid = restaurantId.toLowerCase(java.util.Locale.ROOT)
    val st = graft.serving.ReplicaRouter.table(
      spark, dataDir, "rollup_1m_vals", tenant = rid)
    val keyed = if (rid == All) st else st.filter(col("event_type") === rid)
    val rows = keyed
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + 60000L > from)
      .select(col("value_cents"), col("cnt"))
    // one window stage, like percentiles: same-value rows share the
    // through-value running total under the default RANGE frame, so
    // no value-collapse groupBy is needed and the whole computation
    // is a single bounded single-partition sort
    val w = Window.orderBy(col("value_cents"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def estAt(p: Long) = min(when(
      col("cum") * 1000 >= lit(p) * col("n"), col("value_cents"))).over(full)
    val est = pPerMille
      .foldLeft(rows
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(full))) {
        (df, p) => df.withColumn(s"p${p}_cents", estAt(p))
      }
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n") +: pPerMille.map(p => col(s"p${p}_cents")): _*)
    // union + priority-take envelope — see percentiles' broadcast note
    val empty = spark.range(1).select(
      lit(0L).as("n") +:
        pPerMille.map(p => lit(null).cast("long").as(s"p${p}_cents")): _*)
    est.withColumn("pri", lit(0))
      .unionByName(empty.withColumn("pri", lit(1)))
      .orderBy(col("pri")).limit(1)
      .select(
        lit(rid).as("restaurant_id") +: lit(from).as("from_ms") +:
          lit(to).as("to_ms") +: col("n") +:
          pPerMille.map(p => col(s"p${p}_cents")): _*)
  }

  /** Approximate arbitrary-p quantiles from the HARD-BOUNDED integer
    * log-histogram state (`rollup_1m_loghist`,
    * [[Serving.minuteValueLogHist]] — the DDSketch shape): estimates
    * are bucket lower edges with worst-case relative error
    * 1/16 = 6.25%, and the state stays ≤ ~16 buckets per octave
    * whatever the value domain — the right quantile state for
    * unbounded metrics (latencies, sizes) where the exact
    * value-grain table ([[quantile]]) would grow with the domain.
    * Same route shape as the exact one: one window stage over the
    * routed pin, union+take envelope, `p<ppm>_cents_est` columns.
    */
  def quantileApprox(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      pPerMille: Seq[Long] = Seq(500L),
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pPerMille.nonEmpty && pPerMille.forall(p => p >= 1 && p <= 1000),
      s"per-mille p values must be in [1, 1000], got $pPerMille")
    require(pPerMille.distinct == pPerMille, s"duplicate p values: $pPerMille")
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    require(from < to, s"empty range [$from, $to)")
    val rid = restaurantId.toLowerCase(java.util.Locale.ROOT)
    val st = graft.serving.ReplicaRouter.table(
      spark, dataDir, "rollup_1m_loghist", tenant = rid)
    val keyed = if (rid == All) st else st.filter(col("event_type") === rid)
    val rows = keyed
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + 60000L > from)
      .select(col("lbucket"), col("cnt"))
    val w = Window.orderBy(col("lbucket"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def estAt(p: Long) = min(when(
      col("cum") * 1000 >= lit(p) * col("n"),
      Serving.logBucketEdge(col("lbucket")))).over(full)
    val est = pPerMille
      .foldLeft(rows
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(full))) {
        (df, p) => df.withColumn(s"p${p}_cents_est", estAt(p))
      }
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n") +: pPerMille.map(p => col(s"p${p}_cents_est")): _*)
    val empty = spark.range(1).select(
      lit(0L).as("n") +:
        pPerMille.map(p => lit(null).cast("long").as(s"p${p}_cents_est")): _*)
    est.withColumn("pri", lit(0))
      .unionByName(empty.withColumn("pri", lit(1)))
      .orderBy(col("pri")).limit(1)
      .select(
        lit(rid).as("restaurant_id") +: lit(from).as("from_ms") +:
          lit(to).as("to_ms") +: col("n") +:
          pPerMille.map(p => col(s"p${p}_cents_est")): _*)
  }

  /** [[quantileApprox]] for EVERY event type in ONE pass — the
    * dashboard's "all tenants" sweep as a single serving scan of the
    * per-type log-histogram state with the quantile window
    * PARTITIONED by type, instead of one routed call per type (the
    * per-call plan/schedule overhead dominates at five types and
    * grows with the alphabet). Types absent from the requested range
    * still get the one-row empty envelope (n=0, null estimates), so
    * the result is row-identical to the per-type route union.
    *
    * Latency posture: this is the REPORT route (one sweep for the
    * whole tenant alphabet — ~75 ms/tenant amortized at 5 types,
    * measured), not a single-key lookup; the ≤200 ms serving bar
    * applies to the per-tenant [[quantileApprox]] it replaces five
    * calls of.
    */
  def quantileApproxAllTypes(
      spark: SparkSession,
      dataDir: String,
      pPerMille: Seq[Long] = Seq(500L),
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pPerMille.nonEmpty && pPerMille.forall(p => p >= 1 && p <= 1000),
      s"per-mille p values must be in [1, 1000], got $pPerMille")
    require(pPerMille.distinct == pPerMille, s"duplicate p values: $pPerMille")
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    require(from < to, s"empty range [$from, $to)")
    val st = graft.serving.ReplicaRouter.table(
      spark, dataDir, "rollup_1m_loghist", tenant = All)
    // the tenant alphabet from the (bounded) state, NOT a fact scan —
    // range-independent so out-of-range types keep their envelope row
    val alphabet = st.select(col("event_type")).distinct()
    val rows = st
      .filter(col("p_date") >= Serving.utcDate(from) &&
        col("p_date") <= Serving.utcDate(to) &&
        col("window_start_ms") < to && col("window_start_ms") + 60000L > from)
      .select(col("event_type"), col("lbucket"), col("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("lbucket"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def estAt(p: Long) = min(when(
      col("cum") * 1000 >= lit(p) * col("n"),
      Serving.logBucketEdge(col("lbucket")))).over(full)
    val est = pPerMille
      .foldLeft(rows
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(full))) {
        (df, p) => df.withColumn(s"p${p}_cents_est", estAt(p))
      }
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type") +: col("n") +:
        pPerMille.map(p => col(s"p${p}_cents_est")): _*)
    alphabet.join(est, Seq("event_type"), "left")
      .select(
        col("event_type").as("restaurant_id") +: lit(from).as("from_ms") +:
          lit(to).as("to_ms") +: coalesce(col("n"), lit(0L)).as("n") +:
          pPerMille.map(p => col(s"p${p}_cents_est")): _*)
  }

  /** EP1 wire envelope — the reference's `TopKResponse`
    * (TopKController.kt:134-140) as one JSON document per call:
    * `{restaurantId, startTime, endTime, k, items: [...]}` with items
    * carrying the `TopKResult` field names (models/Models.kt:39-49;
    * menu_item_id is this domain's item key, i.e. user_id). The HTTP
    * transport itself is out of scope by driver contract — this is
    * the exact payload a thin controller would write back.
    */
  def topkResponse(
      spark: SparkSession,
      dataDir: String,
      restaurantId: String = All,
      fromMs: Option[Long] = None,
      toMs: Option[Long] = None,
      k: Int = 10,
      byRevenue: Boolean = false): DataFrame = {
    val now = Serving.anchorMs(spark, dataDir)
    val to = toMs.getOrElse(now)
    val from = fromMs.getOrElse(to - hourMs)
    val rows = topk(spark, dataDir, restaurantId, Some(from), Some(to), k, byRevenue)
    val item = struct(
      col("restaurant_id"),
      col("user_id").cast("string").as("menu_item_id"),
      col("rank"),
      col("order_count"),
      col("total_cents").as("total_revenue_in_cents"),
      col("window_start_ms").as("window_start"),
      col("window_end_ms").as("window_end"))
    // rows arrive ordered in one partition (see topk), so collect_list
    // preserves the response ordering contract.
    rows
      .agg(collect_list(item).as("items"))
      .select(to_json(struct(
        lit(restaurantId.toLowerCase(java.util.Locale.ROOT)).as("restaurantId"),
        lit(from).as("startTime"),
        lit(to).as("endTime"),
        lit(k).as("k"),
        col("items"))).as("response"))
  }
}
