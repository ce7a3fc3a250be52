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

  /** The coarsest source whose grain divides `grainMs`. */
  def route(grainMs: Long): Route =
    if (grainMs > 0 && grainMs % Serving.hourMs == 0) HourlyServing
    else if (grainMs > 0 && grainMs % minuteMs == 0) Rollup1m
    else Raw

  /** (order_count, total_cents) per (grain window, event_type),
    * answered from the routed source.
    */
  def aggregateByType(spark: SparkSession, dataDir: String, grainMs: Long): DataFrame = {
    def bucket(ms: org.apache.spark.sql.Column) =
      (ms - pmod(ms, lit(grainMs))).as("window_start_ms")
    route(grainMs) match {
      case HourlyServing =>
        val root = Serving.materialize(spark, dataDir)
        spark.read.parquet(s"$root/agg_keyed_by_window")
          .groupBy(bucket(col("window_start_ms")), col("event_type"))
          .agg(sum(col("order_count")).as("order_count"),
            sum(col("total_cents")).as("total_cents"))
      case Rollup1m =>
        Rollup.rollup1m(Tables.events(spark, dataDir))
          .groupBy(bucket(col("window_start_ms")), col("event_type"))
          .agg(sum(col("order_count")).as("order_count"),
            sum(col("sum_value_cents")).as("total_cents"))
      case Raw =>
        Tables.events(spark, dataDir)
          .groupBy(bucket(unix_millis(col("ts"))), col("event_type"))
          .agg(count(lit(1)).as("order_count"),
            sum(col("value_cents")).as("total_cents"))
    }
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
  def hybridHourlyByType(spark: SparkSession, dataDir: String): DataFrame = {
    val cutMs = Serving.anchorMs(spark, dataDir) / Serving.hourMs * Serving.hourMs
    val root = Serving.materialize(spark, dataDir)
    val hist = spark.read.parquet(s"$root/agg_keyed_by_window")
      .filter(col("window_start_ms") < cutMs)
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(sum(col("order_count")).as("order_count"),
        sum(col("total_cents")).as("total_cents"))
    val tail = Tables.events(spark, dataDir)
      .filter(unix_millis(col("ts")) >= cutMs)
      .groupBy((unix_millis(col("ts")) - pmod(unix_millis(col("ts")), lit(Serving.hourMs)))
          .as("window_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
    hist.unionByName(tail)
  }
}
