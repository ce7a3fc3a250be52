package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-windowed rollup operators.
  *
  * Mirrors the reference's 1-minute keyed tumbling-window aggregate
  * (TopKStreamingJob.kt:311-315, OrderAggregateFunction :122-147) and
  * its hourly MergeRollupTask compaction
  * (orders_1m_rollup_table.json:72-84). Spark's partial/final hash
  * aggregation reproduces the Flink AggregateFunction partial+merge
  * structure automatically (map-side combine before the shuffle).
  *
  * Measures (SURVEY §2.4 A3/A4): order_count, sum of integer-cents
  * revenue, and distinct users — exact (`countDistinct`, oracle-safe)
  * or HLL sketch (`hll_sketch_agg`, the mergeable production path that
  * matches Pinot's DISTINCTCOUNTHLL capability).
  *
  * Scale notes: one shuffle keyed on (window, dims); the window-start
  * is derived per-row before the exchange so partitioning is by
  * (minute, event_type) — at 100 TB this is the natural even key.
  * Sketches (fixed bytes) instead of collect_set keep state bounded.
  */
object Rollup {

  /** The reference's derived rollup time-part dims, carried IN the
    * rollup output (TopKStreamingJob.kt:66-67,178-179;
    * orders_1m_rollup_schema.json): hour-of-day 0-23 and ISO
    * day-of-week Mon=1..Sun=7 of the window start. Spark's
    * dayofweek() is Sun=1, hence the shift.
    */
  private def timeDims(windowStart: Column): Seq[Column] = Seq(
    hour(windowStart).cast("long").as("hour_of_day"),
    (((dayofweek(windowStart) + lit(5)) % 7) + 1).cast("long").as("day_of_week_iso"))

  /** 1-minute tumbling rollup keyed by `dims`, exact distinct users.
    * Output grain = (window_start_ms, dims...), plus the carried
    * hour_of_day / day_of_week_iso dims.
    */
  def rollup1m(events: DataFrame, dims: Seq[String] = Seq("event_type")): DataFrame =
    events
      .groupBy((window(col("ts"), "1 minute").as("w") +: dims.map(col)): _*)
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("sum_value_cents"),
        countDistinct(col("user_id")).as("unique_users"))
      .select(
        (unix_millis(col("w.start")).as("window_start_ms") +: dims.map(col)) ++
          timeDims(col("w.start")) ++
          Seq(col("order_count"), col("sum_value_cents"), col("unique_users")): _*)

  /** Rollup with a mergeable HLL sketch instead of exact distinct —
    * the scale path (Pinot stores HLL bytes, HLL_MERGE on compaction:
    * orders_1m_rollup_schema.json:50-53, orders_1m_rollup_table.json:80).
    * `withExact = true` additionally carries the exact distinct count
    * (one extra agg buffer) — the self-verification surface the gate
    * hash-checks the estimate against.
    */
  def rollup1mHll(events: DataFrame, dims: Seq[String] = Seq("event_type"),
      withExact: Boolean = false): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("order_count"),
      sum(col("value_cents")).as("sum_value_cents"),
      hll_sketch_agg(col("user_id").cast("string")).as("users_hll")) ++
      (if (withExact) Seq(countDistinct(col("user_id")).as("unique_users")) else Nil)
    events
      .groupBy((window(col("ts"), "1 minute").as("w") +: dims.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (unix_millis(col("w.start")).as("window_start_ms") +: dims.map(col)) ++
          timeDims(col("w.start")) ++
          Seq(col("order_count"), col("sum_value_cents"),
            hll_sketch_estimate(col("users_hll")).as("unique_users_est"),
            col("users_hll")) ++
          (if (withExact) Seq(col("unique_users")) else Nil): _*)
  }

  /** est_ok self-check column: 1 when the sketch estimate is within
    * max(2, 5%) of the exact count — pure integer arithmetic
    * (20·|est−exact| ≤ max(40, exact)), so the DuckDB oracle asserts
    * the SAME predicate as a constant 1 and a drifting sketch flips
    * the hash compare red instead of hiding behind "no oracle".
    */
  def estOk(est: Column, exact: Column): Column =
    when(abs(est.cast("long") - exact) * 20 <= greatest(lit(40L), exact), lit(1L))
      .otherwise(lit(0L))

  /** Merge per-batch rollup SEGMENTS back to one row per (window,
    * dims) — Pinot's MergeRollupTask applied at segment grain: the
    * streaming pipeline appends one partial segment per micro-batch
    * (StreamingPipeline.rollupSegment), and this maintenance pass
    * bounds the segment count without changing any query result —
    * sums re-sum and HLL sketches merge losslessly, so query-time
    * re-aggregation before and after compaction agrees exactly.
    * Input needs (window_start_ms, dims, order_count,
    * sum_value_cents, users_hll); hour/day dims are re-derived.
    */
  def compactSegments(segments: DataFrame, dims: Seq[String] = Seq("event_type")): DataFrame =
    segments
      .groupBy((col("window_start_ms") +: dims.map(col)): _*)
      .agg(
        sum(col("order_count")).as("order_count"),
        sum(col("sum_value_cents")).as("sum_value_cents"),
        hll_union_agg(col("users_hll")).as("users_hll"))
      .select(
        (col("window_start_ms") +: dims.map(col)) ++
          timeDims(timestamp_millis(col("window_start_ms"))) ++
          Seq(col("order_count"), col("sum_value_cents"),
            hll_sketch_estimate(col("users_hll")).as("unique_users_est"),
            col("users_hll")): _*)

  /** Hourly compaction of a 1-minute rollup (MergeRollupTask
    * semantics: sums re-summed; HLL re-merged by the caller when the
    * sketch column is carried). Input must have `window_start_ms`.
    */
  def compactHourly(rollup: DataFrame, dims: Seq[String] = Seq("event_type")): DataFrame = {
    val hourMs = 3600L * 1000L
    rollup
      .withColumn("hour_start_ms", (col("window_start_ms") / hourMs).cast("long") * hourMs)
      .groupBy((col("hour_start_ms") +: dims.map(col)): _*)
      .agg(
        sum(col("order_count")).as("order_count"),
        sum(col("sum_value_cents")).as("sum_value_cents"))
  }

  /** Hourly compaction of the HLL rollup — the reference's actual
    * MergeRollupTask config (orders_1m_rollup_table.json:80 does
    * HLL_MERGE alongside the SUMs). Sketches re-merge losslessly via
    * `hll_union_agg`, so query-time estimates off the hourly table
    * equal estimates off the minute table — the property that makes
    * sketch rollups safe to compact at 100 TB.
    */
  def compactHourlyHll(rollupHll: DataFrame, dims: Seq[String] = Seq("event_type")): DataFrame = {
    val hourMs = 3600L * 1000L
    rollupHll
      .withColumn("hour_start_ms", (col("window_start_ms") / hourMs).cast("long") * hourMs)
      .groupBy((col("hour_start_ms") +: dims.map(col)): _*)
      .agg(
        sum(col("order_count")).as("order_count"),
        sum(col("sum_value_cents")).as("sum_value_cents"),
        hll_union_agg(col("users_hll")).as("users_hll"))
      .withColumn("unique_users_est", hll_sketch_estimate(col("users_hll")))
  }

  /** Query-time re-aggregation over a sketch rollup — Pinot's
    * `DISTINCTCOUNTHLL(user_id)` over any dim/time slice
    * (pinot/README.md §Sample Queries): merge the stored per-window
    * sketches instead of rescanning raw events.
    */
  def distinctOverRollupHll(rollupHll: DataFrame, dims: Seq[String]): DataFrame =
    rollupHll
      .groupBy(dims.map(col): _*)
      .agg(hll_union_agg(col("users_hll")).as("users_hll"))
      .select(dims.map(col) :+
        hll_sketch_estimate(col("users_hll")).as("unique_users_est"): _*)

  /** A5: processing-time tumbling rollup — the reference's legacy
    * Kafka-consumer path windows on arrival time, not event time
    * (KafkaConsumerTopKJob's processing-time tumble; SURVEY §2.4 A5).
    * `current_timestamp()` stamps each row at ingest; use with
    * update/complete output mode (no event-time watermark exists to
    * finalize windows in append mode). Event-time A1 remains the
    * better default — this exists for parity with consumers that want
    * wall-clock batching semantics.
    */
  def rollupProcessingTime(
      stream: DataFrame,
      dims: Seq[String] = Seq("event_type"),
      windowDuration: String = "1 minute"): DataFrame =
    stream
      .withColumn("proc_ts", current_timestamp())
      .groupBy((window(col("proc_ts"), windowDuration).as("w") +: dims.map(col)): _*)
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("sum_value_cents"))
      .select(
        (unix_millis(col("w.start")).as("window_start_ms") +: dims.map(col)) ++
          Seq(col("order_count"), col("sum_value_cents")): _*)

  /** Time-part profile: activity by hour-of-day and ISO day-of-week
    * (Mon=1..Sun=7, java.time.DayOfWeek semantics like the reference's
    * RollupProcessFunction — TopKStreamingJob.kt:163-179). Spark's
    * dayofweek() is Sun=1, so shift: ((dow + 5) % 7) + 1.
    */
  def hourOfDayProfile(events: DataFrame): DataFrame =
    events
      .groupBy(
        hour(col("ts")).as("hour_of_day"),
        (((dayofweek(col("ts")) + lit(5)) % 7) + 1).as("day_of_week_iso"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("sum_value_cents"))
}
