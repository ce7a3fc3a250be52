package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Rollup

/** Grain-aware source routing — Pinot's rollup/star-tree selection
  * made explicit: a time-grained aggregate query is answered from the
  * COARSEST pre-aggregated table whose grain divides the requested
  * one, falling back to raw events only when nothing divides.
  *
  * Routing is an explicit API rather than a transparent optimizer
  * rewrite on purpose: materialized-view substitution silently trades
  * freshness for speed, and that trade (like Pinot's own
  * table-selection config) belongs in the caller's hands.
  *
  * 100 TB: the hourly route scans the serving agg table —
  * ~events/3600 rows, date-partitioned and sorted — instead of the
  * raw fact. Re-aggregation from a divisible grain is lossless for
  * SUM/COUNT (hash-checked by the gate); non-reaggregable metrics
  * (exact distinct) must route to a sketch rollup instead
  * ([[graft.ops.Rollup.distinctOverRollupHll]]).
  */
object Router {

  val minuteMs: Long = 60L * 1000L

  sealed trait Route
  case object HourlyServing extends Route
  case object Rollup1m extends Route
  case object Raw extends Route

  /** The coarsest source whose grain divides `grainMs`.
    * `has1mRollup` says whether the caller actually has a MATERIALIZED
    * 1-minute rollup (this serving layout persists only the hourly
    * grain): routing to a rollup that would be recomputed from raw on
    * the fly is strictly worse than the Raw route, so minute-divisible
    * grains fall through to Raw unless one exists.
    */
  def route(grainMs: Long, has1mRollup: Boolean = false): Route =
    if (grainMs > 0 && grainMs % Serving.hourMs == 0) HourlyServing
    else if (has1mRollup && grainMs > 0 && grainMs % minuteMs == 0) Rollup1m
    else Raw

  /** (order_count, total_cents) per (grain window, event_type),
    * answered from the routed source.
    */
  def aggregateByType(spark: SparkSession, dataDir: String, grainMs: Long): DataFrame = {
    route(grainMs) match {
      case HourlyServing =>
        val root = Serving.materialize(spark, dataDir)
        spark.read.parquet(s"$root/agg_keyed_by_window")
          .groupBy(bucket(col("window_start_ms"), grainMs), col("event_type"))
          .agg(sum(col("order_count")).as("order_count"),
            sum(col("total_cents")).as("total_cents"))
      case _ =>
        Tables.events(spark, dataDir)
          .groupBy(bucket(unix_millis(col("ts")), grainMs), col("event_type"))
          .agg(count(lit(1)).as("order_count"),
            sum(col("value_cents")).as("total_cents"))
    }
  }

  /** Re-aggregation from a caller-materialized 1-minute rollup
    * ([[graft.ops.Rollup.rollup1m]] schema) to any minute-divisible
    * grain — the Rollup1m route's compute, for deployments that DO
    * persist the 1m table (the reference's `orders_1m_rollup`).
    */
  def aggregateFromRollup1m(rollup1m: DataFrame, grainMs: Long): DataFrame = {
    require(grainMs > 0 && grainMs % minuteMs == 0,
      s"grain $grainMs ms is not minute-divisible")
    rollup1m
      .groupBy(bucket(col("window_start_ms"), grainMs), col("event_type"))
      .agg(sum(col("order_count")).as("order_count"),
        sum(col("sum_value_cents")).as("total_cents"))
  }

  private def bucket(ms: org.apache.spark.sql.Column, grainMs: Long) =
    (ms - pmod(ms, lit(grainMs))).as("window_start_ms")

  /** COMPOSED routing: dimension subset AND time grain decide the
    * source per query, the way Pinot's broker picks star-tree vs
    * rollup vs raw segments per query shape:
    *
    *  - no time grain, dims within the star-tree → the matching
    *    pre-aggregated NODE: one pruned `gid` partition directory,
    *    fact table untouched ([[StarTree.aggregate]]);
    *  - a time grain over `event_type` → the grain router
    *    ([[aggregateByType]]: hourly serving table when the grain
    *    divides the hour, else raw);
    *  - anything else (a dim outside the tree, or grain + profile
    *    dims) → raw — the only source that can answer it. High-card
    *    dims like user_id are outside the tree BY CONTRACT (Pinot
    *    likewise excludes them), so this arm is the correct route,
    *    not a missed optimization.
    *
    * Metric names are unified to (order_count, sum_value_cents)
    * across arms so callers can switch routes without rewrites.
    */
  def aggregateProfile(spark: SparkSession, dataDir: String,
      groupDims: Seq[String], grainMs: Long = 0L): DataFrame = {
    if (grainMs <= 0L && groupDims.nonEmpty &&
        groupDims.toSet.subsetOf(StarTree.dims.toSet))
      StarTree.aggregate(spark, dataDir, groupDims)
    else if (grainMs > 0L && groupDims == Seq("event_type"))
      aggregateByType(spark, dataDir, grainMs)
        .withColumnRenamed("total_cents", "sum_value_cents")
    else {
      val base = Tables.events(spark, dataDir).select(
        col("event_type"), col("user_id"),
        (((dayofweek(col("ts")) + lit(5)) % 7) + 1).cast("long")
          .as("day_of_week_iso"),
        hour(col("ts")).cast("long").as("hour_of_day"),
        unix_millis(col("ts")).as("ts_ms"),
        col("value_cents"))
      val keys =
        (if (grainMs > 0L) Seq(bucket(col("ts_ms"), grainMs)) else Nil) ++
          groupDims.map(col)
      base.groupBy(keys: _*)
        .agg(count(lit(1)).as("order_count"),
          sum(col("value_cents")).as("sum_value_cents"))
    }
  }

  /** Flink CUMULATE at the day/hour grain, folded forward from the
    * materialized hourly agg instead of re-expanding raw events
    * ([[graft.queries.OlapQueries.cumulateDaily]] is the
    * oracle-checkable raw form). Hour marks end on hour boundaries
    * and SUM/COUNT re-aggregate losslessly, so expanding each HOURLY
    * row to the marks it feeds is exact — the ×24 worst-case expand
    * runs over ~1/3600 of the raw rows at any scale, which is the
    * whole point of the serving table.
    */
  def cumulateDailyFromHourly(spark: SparkSession, dataDir: String): DataFrame = {
    val dayMs = 24L * Serving.hourMs
    val root = Serving.materialize(spark, dataDir)
    spark.read.parquet(s"$root/agg_keyed_by_window")
      .select(col("window_start_ms"), col("event_type"),
        col("order_count"), col("total_cents"))
      .withColumn("p0", col("window_start_ms") - pmod(col("window_start_ms"), lit(dayMs)))
      .withColumn("k", explode(sequence(
        ((col("window_start_ms") - col("p0")) / lit(Serving.hourMs)).cast("long") + 1,
        lit(dayMs / Serving.hourMs))))
      .groupBy(col("p0").as("day_start_ms"),
        (col("p0") + col("k") * Serving.hourMs).as("window_end_ms"), col("event_type"))
      .agg(sum(col("order_count")).as("order_count"),
        sum(col("total_cents")).as("total_cents"))
  }

  /** Hybrid (lambda) serving — Pinot's offline+realtime hybrid-table
    * shape: hourly aggregates answered from the materialized rollup
    * for every COMPLETE hour, and from the raw tail for the current
    * (possibly incomplete) hour, unioned at a single cut timestamp.
    * The cut is the half-open seam `[cut, ∞) ← raw, (-∞, cut) ←
    * rollup`; the gate hash-checks the union against a pure-raw
    * oracle, which is exactly the double-count/gap test at the seam.
    *
    * 100 TB: the history side reads the rollup (~1/3600 of raw); the
    * tail side's raw scan is bounded by one hour of ingest regardless
    * of table age.
    */
  def hybridHourlyByType(spark: SparkSession, dataDir: String): DataFrame =
    // eventsFrom applies the floor to the RAW ns column so the scan
    // prunes row groups — a filter on the derived ts would not push
    hybridWith(spark, dataDir,
      cutMs => Tables.eventsFrom(spark, dataDir, cutMs))

  /** The hybrid seam, parameterized by the raw-tail source: complete
    * hours from the materialized hourly agg, the in-flight hour from
    * whatever raw arm the caller supplies (flat events scan, tiered
    * store, ...). One definition of the cut and both aggregates, so
    * the tiered and flat hybrids can never silently diverge.
    */
  private def hybridWith(spark: SparkSession, dataDir: String,
      tailSource: Long => DataFrame): DataFrame = {
    val cutMs = Serving.anchorMs(spark, dataDir) / Serving.hourMs * Serving.hourMs
    val root = Serving.materialize(spark, dataDir)
    val hist = spark.read.parquet(s"$root/agg_keyed_by_window")
      .filter(col("window_start_ms") < cutMs)
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(sum(col("order_count")).as("order_count"),
        sum(col("total_cents")).as("total_cents"))
    val tail = tailSource(cutMs)
      .groupBy(bucket(unix_millis(col("ts")), Serving.hourMs), col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
    hist.unionByName(tail)
  }

  /** [[hybridHourlyByType]] with the raw tail served THROUGH a
    * [[Tiered]] events root — the full Pinot hybrid-table-with-tiers
    * stack: the rollup/raw seam (complete hours from the materialized
    * hourly agg, the live hour from raw) COMPOSES with the hot/cold
    * storage boundary inside the raw arm. The tail carries an
    * explicit `p_date` floor alongside the exact ts seam: the ts
    * predicate alone would row-group-prune within files but still
    * LIST every date directory on both tiers, while the p_date floor
    * directory-prunes them — a recent-window query through the
    * composed path opens ZERO cold files (RouterSpec pins it), which
    * is the whole point of keeping an archive tier: serving-path
    * queries never pay for the archive's existence.
    */
  def hybridHourlyByTypeTiered(spark: SparkSession, dataDir: String,
      tieredRoot: String): DataFrame =
    hybridWith(spark, dataDir, cutMs =>
      Tiered.read(spark, tieredRoot)
        .filter(col("p_date") >= lit(Serving.utcDate(cutMs)))
        .filter(unix_millis(col("ts")) >= cutMs))
}
