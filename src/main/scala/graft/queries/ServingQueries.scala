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

  /** The count-path lookup routed through replica groups
    * ([[graft.serving.ReplicaRouter]], the X6 analog): the
    * materialized `topk_by_count` table is replicated n=2 on first
    * routed use (keyed by serving root, so a regenerated dataset
    * re-replicates), and the query pins to the replica its tenant key
    * hashes to — identical results from any copy (ReplicasSpec proves
    * copy-equality and failover), so this shares
    * `q_topk_lookup_served`'s oracle and hash-checks the whole
    * replicate → route → read path. Stamp-driven re-replication and
    * the pinned-copy cache live in the shared router, which also
    * serves the revenue path and the API façade.
    */
  def topKLookupReplica(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.serving.ReplicaRouter.table(spark, dir, "topk_by_count")
    val t0 = Serving.anchorMs(spark, dir) - 72L * hourMs
    table
      .filter(col("p_date") >= Serving.utcDate(t0) &&
        col("window_start_ms") >= t0 && col("rank") <= 3)
      .select(col("window_start_ms"), col("rank"), col("user_id"),
        col("order_count"), col("total_cents"))
      .coalesce(1)
      .sortWithinPartitions(col("window_start_ms").desc, col("rank").asc)
  }

  /** Revenue-path lookup (QueryService.kt:99-129): top-10 entries
    * across the last 72 h ordered by revenue desc then window end
    * desc (user asc tie-break pinned for determinism). Reads through
    * the replica router like the count path — Pinot routes every
    * query class through replica groups, not just one table — so
    * this gate hash-checks the routed revenue path end-to-end.
    */
  def topKLookupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t0 = Serving.anchorMs(spark, dir) - 72L * hourMs
    graft.serving.ReplicaRouter.table(spark, dir, "topk_by_revenue")
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

  /** The hybrid seam STACKED on the storage tiers
    * ([[graft.serving.Router.hybridHourlyByTypeTiered]]): complete
    * hours from the rollup, the in-flight hour from the TIERED raw
    * table — whose hot/cold boundary the recent-window tail never
    * crosses (RouterSpec pins zero cold files opened). Shares the
    * pure-raw oracle: the rollup/raw seam and the hot/cold relocation
    * must BOTH be invisible in the answer.
    */
  def hybridTiered(spark: SparkSession, dir: String): DataFrame =
    graft.serving.Router.hybridHourlyByTypeTiered(spark, dir,
      tieredRoot(spark, dir))

  /** Serving-latency-class read THROUGH the tiered store: last-24 h
    * counts+revenue by type, with an explicit `p_date` floor so the
    * scan directory-prunes both tiers — the measured claim that the
    * archive tier costs the serving path nothing (the bench reports
    * this gate in milliseconds next to the `q_api_*` family; the plan
    * half of the claim is RouterSpec's zero-cold-files assert). What
    * holds it under the 200 ms bar (the r14 verdict's one red
    * number): [[graft.serving.Tiered.read]]'s frame cache — the
    * barrier probes, footer inference, and file listings run once per
    * root per generation, not per call — and a TIMESTAMP-literal ts
    * comparison (not `unix_millis(ts) >= cut`, which wraps the column
    * and blocks pushdown) so the range predicate reaches the parquet
    * row-group stats. A rollup-fed twin (`q_tiered_recent_served`)
    * pins the reference's serve-from-rollup architecture against the
    * same oracle; at this hot-tier size the pruned one-date raw scan
    * measured FASTER than re-aggregating the minute state, so the raw
    * form keeps the latency-family slot.
    */
  def tieredRecent(spark: SparkSession, dir: String): DataFrame = {
    val root = tieredRoot(spark, dir)
    val cutMs = graft.serving.Serving.anchorMs(spark, dir) - 24L * hourMs
    graft.serving.Tiered.read(spark, root)
      .filter(col("p_date") >= lit(graft.serving.Serving.utcDate(cutMs)))
      .filter(col("ts") >= lit(new java.sql.Timestamp(cutMs)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
  }

  /** The rollup-fed twin of [[tieredRecent]] — the reference's own
    * serving architecture (queries hit the rollup table, not raw):
    * COMPLETE minutes of the last-24 h window come from the pinned
    * minute-rollup state (exact — a minute window ≥ the cut's minute
    * ceiling is wholly interior to the window, the
    * [[topKTrendingServed]] argument), and only the BOUNDARY minute
    * (the sub-minute sliver at the window's trailing edge, when the
    * cut is not minute-aligned) reads raw — THROUGH the tiered store,
    * pruned to that single hot date. Shares the raw-scan oracle: the
    * rollup/raw seam must be invisible in the answer. At 100 TB this
    * is the shape that wins (state rows ≪ raw rows); at this sf the
    * raw date is already tiny, which is why the raw form holds the
    * latency-family slot instead.
    */
  def tieredRecentServed(spark: SparkSession, dir: String): DataFrame = {
    val root = tieredRoot(spark, dir)
    val cutMs = graft.serving.Serving.anchorMs(spark, dir) - 24L * hourMs
    val minuteEnd = ((cutMs + 59999L) / 60000L) * 60000L // minute ceiling
    val rollupArm = Serving.readTable(spark, dir, "rollup_1m")
      .filter(col("window_start_ms") >= lit(minuteEnd))
      .select(col("event_type"), col("order_count").as("n"),
        col("sum_value_cents").as("cents"))
    val boundaryArm = graft.serving.Tiered.read(spark, root)
      .filter(col("p_date") === lit(graft.serving.Serving.utcDate(cutMs)))
      .filter(col("ts") >= lit(new java.sql.Timestamp(cutMs)) &&
        col("ts") < lit(new java.sql.Timestamp(minuteEnd)))
      .select(col("event_type"), lit(1L).as("n"),
        col("value_cents").as("cents"))
    rollupArm.unionByName(boundaryArm)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("order_count"),
        sum(col("cents")).as("total_cents"))
  }

  /** Incremental CUMULATE ([[graft.serving.Router
    * .cumulateDailyFromHourly]]): expanding daily windows folded
    * forward from the hourly serving agg. Hash-checked against the
    * same raw-expand oracle as `q_cumulate_daily`, proving the
    * rollup-fed form exact.
    */
  def cumulateDailyRouted(spark: SparkSession, dir: String): DataFrame =
    graft.serving.Router.cumulateDailyFromHourly(spark, dir)

  /** Served value percentiles (p50/p90/p99, cents) per event_type
    * over the last 24 h of minute windows — read from the materialized
    * histogram state ([[Serving.minuteValueHist]]), never from raw
    * events. Re-aggregating fixed-bin counts under a window filter is
    * EXACT (counts are additive), so the estimate is a deterministic
    * integer function of the data and hash-checks against a raw-scan
    * oracle computing the same binned quantile: the p-th estimate is
    * the lower edge of the first bin whose cumulative count reaches
    * p% of the total (`100*cum >= p*n` — integer form, no ceil/FP).
    * Precision is the bin width (1 dollar); tighter needs only a
    * narrower bin in the state, not a different read path.
    *
    * Scale: the scan is partition-pruned to the filter's dates and
    * the re-aggregation domain is types x occupied bins (hundreds of
    * rows), so the window cumsum is a no-shuffle-pressure final step
    * over an already-tiny frame.
    */
  def percentilesServed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t0 = Serving.anchorMs(spark, dir) - 24L * hourMs
    val hist = Serving.readTable(spark, dir, "rollup_1m_hist")
      .filter(col("p_date") >= Serving.utcDate(t0) && // directory pruning
        col("window_start_ms") > t0)
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("cnt")).as("c"))
    val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("bin"))))
    val ps = Seq(50L, 90L, 99L)
    cum.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("n"), col("bin"), col("cum"),
        explode(array(ps.map(lit): _*)).as("p"))
      .filter(col("cum") * 100 >= col("p") * col("n"))
      .groupBy(col("event_type"), col("n"), col("p"))
      .agg(min(col("bin") * lit(Serving.histBinCents)).as("est"))
      .groupBy(col("event_type"), col("n"))
      .agg(
        max(when(col("p") === 50, col("est"))).as("p50_cents"),
        max(when(col("p") === 90, col("est"))).as("p90_cents"),
        max(when(col("p") === 99, col("est"))).as("p99_cents"))
  }

  /** One-dim star-tree node ([[graft.serving.StarTree]]): revenue by
    * event_type answered from the gid=3 node directory — pruned
    * pre-aggregated rows, fact table untouched. Hash-equality with a
    * raw GROUP BY oracle proves node build + routing lossless.
    */
  def starTreeByType(spark: SparkSession, dir: String): DataFrame =
    graft.serving.StarTree.aggregate(spark, dir, Seq("event_type"))

  /** Two-dim star-tree node: the (ISO dow × hour) activity profile —
    * the same result shape as `q_hour_profile`, served from the gid=4
    * node instead of scanning events.
    */
  def starTreeProfile(spark: SparkSession, dir: String): DataFrame =
    graft.serving.StarTree.aggregate(spark, dir,
      Seq("day_of_week_iso", "hour_of_day"))

  /** COMPOSED dim+grain routing ([[graft.serving.Router
    * .aggregateProfile]]): a (event_type × hour-of-day) profile
    * request routed per query shape — this one lands on the star-tree
    * gid=2 node, a single pruned pre-aggregated directory (RouterSpec
    * asserts the 1-directory plan; the grain and raw arms are
    * spec-covered there too). Hash-checked against a raw GROUP BY.
    */
  def routedProfile(spark: SparkSession, dir: String): DataFrame =
    graft.serving.Router.aggregateProfile(spark, dir,
      Seq("event_type", "hour_of_day"))

  /** Trending top-K SERVED from the materialized minute rollup: each
    * (minute, type) state row expands to the 4 enclosing 1h/15m
    * sliding windows — a minute is always INTERIOR to a sliding
    * window (never split), so re-aggregating the rollup is EXACT —
    * then re-sums and ranks top-3 per window. Shares the raw-scan
    * trending gate's oracle, which proves the rollup's sliding
    * re-aggregation lossless end-to-end (build + expand + rank).
    * Scale: reads |minutes|×|types| state rows instead of the fact;
    * the ×4 expand happens on the state, and WindowGroupLimit caps
    * per-window rank state at k.
    */
  def topKTrendingServed(spark: SparkSession, dir: String): DataFrame =
    trendingOfRollup(Serving.readTable(spark, dir, "rollup_1m"))

  /** The sliding re-aggregation + rank over any `rollup_1m`-shaped
    * frame — shared by the one-shot-built and stream-built roots.
    */
  private def trendingOfRollup(rollup: DataFrame): DataFrame = {
    val agg = rollup
      .withColumn("k", explode(sequence(lit(0L), lit(3L))))
      .groupBy(
        ((expr("window_start_ms DIV 900000") - col("k")) * 900000L)
          .as("window_start_ms"),
        col("event_type"))
      .agg(sum(col("order_count")).as("n_events"),
        sum(col("sum_value_cents")).as("sum_cents"))
    graft.ops.TopK.topKPerKey(agg, Seq("window_start_ms"),
        Seq(col("n_events").desc, col("event_type").asc), 3)
      .select(col("window_start_ms"), col("rank").cast("long").as("rank"),
        col("event_type"), col("n_events"), col("sum_cents"))
  }

  /** "Hot right now" (time-decayed) top-K SERVED from the hourly
    * per-user state — `q_topk_decayed`'s production shape: the
    * shift-decay half-life (12 h) is an exact MULTIPLE of the
    * `agg_by_window` grain (1 h) and the anchor is the state's own
    * latest window, so every state row falls WHOLLY inside one age
    * bucket and the served score is an exact re-aggregation,
    * score = Σ order_count · (2^20 >> min(age DIV 12h, 20)) — the
    * same argument that makes the trending family's minute-interior
    * re-aggregation lossless. Reads |hours|×|users| state rows
    * instead of the fact table; recomputing the decayed board on a
    * trigger is one map-side weighted sum over state.
    */
  def topKDecayedServed(spark: SparkSession, dir: String): DataFrame =
    decayedOfAgg(Serving.readTable(spark, dir, "agg_by_window"))

  /** The decayed board off a STREAM-BUILT root's hourly state —
    * hash-gating the incremental-refresh → state → decay-derive
    * composition against the same hour-grain mirror oracle.
    */
  def topKDecayedStream(spark: SparkSession, dir: String): DataFrame =
    decayedOfAgg(
      spark.read.parquet(s"${streamBuiltRoot(spark, dir)}/agg_by_window"))

  /** The exact shift-decay re-aggregation + rank over any
    * `agg_by_window`-shaped frame — shared by the one-shot-built and
    * stream-built roots.
    */
  private def decayedOfAgg(agg: DataFrame): DataFrame = {
    // 1-row broadcast: the decay anchor is the state's latest window
    val anchored = agg.crossJoin(
      broadcast(agg.agg(max(col("window_start_ms")).as("anchor_ms"))))
    // integer DIV + right-shift — the whole weight is exact (the
    // q_topk_decayed chain at hour grain)
    val w = expr("shiftright(1048576L, CAST(least(" +
      "(anchor_ms - window_start_ms) DIV 43200000, 20L) AS INT))")
    val s = anchored
      .groupBy(col("user_id"))
      .agg(sum(col("order_count") * w).as("score_micro"),
        sum(col("order_count")).as("n_events"))
    graft.ops.TopK.topKGlobal(s,
        Seq(col("score_micro").desc, col("user_id").asc), 10)
      .select(col("rank").cast("long").as("rank"), col("user_id"),
        col("score_micro"), col("n_events"))
  }

  private val tieredCache = new TempRootCache("graft_tiered")

  /** A [[graft.serving.Tiered]] events table, built once per dataset
    * fingerprint: everything lands hot, then the OLDER HALF of the
    * date range demotes to the cold tier (one staged commit — one
    * sorted zstd file per cold date). The mid-range cutoff derives
    * from the data itself so the split is real at every sf.
    */
  private def tieredRoot(spark: SparkSession, dir: String): String =
    tieredCache.root(spark, dir) { p =>
      val ev = graft.Tables.events(spark, dir)
      val sortCols = Seq("event_type", "ts")
      graft.serving.Tiered.build(spark, ev, p, "ts", sortCols,
        bloomCol = Some("event_id"))
      // archive layout: bloom on the RTBF identity key, so an erase's
      // affected-date discovery row-group-skips instead of scanning
      // the whole cold tier (TieredSpec pins the pruning)
      graft.serving.Tiered.demote(spark, p, midDate(spark, dir), sortCols,
        coldBloomCols = Seq("user_id"))
    }

  /** Mid-range date cut derived from the data itself (every oracle
    * replays it in SQL) — shared by the tiered and evolution gates.
    */
  private def midDate(spark: SparkSession, dir: String): String = {
    val r = graft.Tables.events(spark, dir)
      .agg(min(to_date(col("ts"))), max(to_date(col("ts")))).head()
    val (lo, hi) = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
    lo.plusDays(java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2).toString
  }

  /** Daily revenue by type over the TIERED table — the scan spans the
    * hot/cold boundary, so hash-equality with the raw-scan oracle
    * (shared with `q_routed_daily`) proves relocation neither lost,
    * duplicated, nor reordered a row across the tiers.
    */
  def tieredDaily(spark: SparkSession, dir: String): DataFrame =
    tieredDailyOf(spark, tieredRoot(spark, dir))

  private def tieredDailyOf(spark: SparkSession, root: String): DataFrame = {
    val t = graft.serving.Tiered.read(spark, root)
    val ms = unix_millis(col("ts"))
    val grain = 24L * hourMs
    t.groupBy((ms - pmod(ms, lit(grain))).as("window_start_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
  }

  private val tieredStreamCache = new TempRootCache("graft_tiered_stream")

  /** The tiered table's INGEST-TWIN gate: the same root built the way
    * a live deployment builds it — an initial hot build plus two
    * `ingest` appends (id-split thirds, the `streamBuiltRoot`
    * pattern), a mid-range demote BETWEEN the appends (so the third
    * batch backfills dates the demote already moved cold), and a
    * final maintenance tick that folds the backfill into the cold
    * files as a union. Ingest order, the demote seam, and the
    * backfill fold must all be invisible: shares the raw-scan oracle.
    */
  def tieredStreamDaily(spark: SparkSession, dir: String): DataFrame = {
    val root = tieredStreamCache.root(spark, dir) { p =>
      val ev = graft.Tables.events(spark, dir)
      val sortCols = Seq("event_type", "ts")
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val cuts = Seq(maxId / 3, 2 * maxId / 3)
      graft.serving.Tiered.build(spark,
        ev.filter(col("event_id") <= cuts(0)), p,
        tsCol = "ts", sortCols = sortCols, bloomCol = Some("event_id"))
      graft.serving.Tiered.ingest(spark,
        ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1)),
        p, "ts", sortCols, Some("event_id"))
      val cutoff = midDate(spark, dir)
      graft.serving.Tiered.demote(spark, p, cutoff, sortCols,
        coldBloomCols = Seq("user_id"))
      // the last third lands AFTER the demote: its pre-cutoff dates
      // are the live backfill case the next tick must fold cold
      graft.serving.Tiered.ingest(spark,
        ev.filter(col("event_id") > cuts(1)), p, "ts", sortCols,
        Some("event_id"))
      // the tick carries the SAME archive-layout knobs as the manual
      // demote above (the Tier contract), so the backfill fold keeps
      // the erase-key blooms
      graft.serving.Maintenance.run(spark, Seq(graft.serving.Maintenance.Tier(
        p, sortCols, hotDays = 0, nowDate = cutoff,
        coldBloomCols = Seq("user_id"))))
      ()
    }
    tieredDailyOf(spark, root)
  }

  private val tieredPipeCache = new TempRootCache("graft_tiered_pipe")

  /** The tiered table built the way [[graft.streaming
    * .StreamingPipeline.startTiered]]'s raw leg builds it: id-split
    * thirds LAND as exactly-once batch partitions
    * (`writeBatchIdempotent` — the literal foreachBatch raw leg),
    * and the maintenance tick ([[graft.serving.Maintenance.Tier]]
    * with `absorbIngest`) folds them into the hot tier and demotes —
    * landing → hot → cold in one lifecycle. A tick between batches 2
    * and 3 makes batch 3 a post-demote arrival whose dates must fold
    * back through absorb and re-demote. Shares the raw-scan oracle:
    * the landing/absorb/demote machinery must be invisible in the
    * answer.
    */
  def tieredPipelineDaily(spark: SparkSession, dir: String): DataFrame = {
    val root = tieredPipeCache.root(spark, dir) { p =>
      val ev = graft.Tables.events(spark, dir)
      val sortCols = Seq("event_type", "ts")
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val cuts = Seq(maxId / 3, 2 * maxId / 3)
      val cutoff = midDate(spark, dir)
      def tick(): Unit = {
        graft.serving.Maintenance.run(spark, Seq(graft.serving.Maintenance.Tier(
          p, sortCols, hotDays = 0, nowDate = cutoff, absorbIngest = true,
          bloomCol = Some("event_id"), coldBloomCols = Seq("user_id"))))
        ()
      }
      graft.serving.Tiered.landBatch(
        ev.filter(col("event_id") <= cuts(0)), 0L, p)
      graft.serving.Tiered.landBatch(
        ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1)),
        1L, p)
      tick()
      graft.serving.Tiered.landBatch(
        ev.filter(col("event_id") > cuts(1)), 2L, p)
      tick()
    }
    tieredDailyOf(spark, root)
  }

  private val evolveCache = new TempRootCache("graft_evolve")

  /** Schema evolution end-to-end ([[graft.tables.Evolve]]): a daily
    * rollup table whose first epoch (dates before the data-derived
    * mid-range cut) was written BEFORE the table had a `total_cents`
    * metric; the column is added as one metadata write (default "0",
    * zero files rewritten), and the second epoch appends with real
    * values — exactly how a Pinot table gains a metric mid-life. The
    * evolved read must answer with the default on pre-evolution
    * segments and real values after, which the oracle replays with
    * the same mid-range CASE split over the raw fact.
    */
  def evolvedDaily(spark: SparkSession, dir: String): DataFrame = {
    val root = evolveCache.root(spark, dir) { p =>
      val ev = graft.Tables.events(spark, dir)
      val mid = midDate(spark, dir)
      val ms = unix_millis(col("ts"))
      val grain = 24L * hourMs
      val keyed = ev.withColumn("d", to_date(col("ts")))
        .withColumn("window_start_ms", ms - pmod(ms, lit(grain)))
      keyed.filter(col("d") < lit(mid))
        .groupBy(col("window_start_ms"), col("event_type"))
        .agg(count(lit(1)).as("order_count"))
        .write.mode("overwrite").parquet(p)
      graft.tables.Evolve.register(spark, p, spark.read.parquet(p).schema)
      graft.tables.Evolve.addColumn(spark, p,
        org.apache.spark.sql.types.StructField("total_cents",
          org.apache.spark.sql.types.LongType), default = "0")
      keyed.filter(col("d") >= lit(mid))
        .groupBy(col("window_start_ms"), col("event_type"))
        .agg(count(lit(1)).as("order_count"),
          sum(col("value_cents")).as("total_cents"))
        .write.mode("append").parquet(p)
    }
    graft.tables.Evolve.read(spark, root)
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(sum(col("order_count")).as("order_count"),
        sum(col("total_cents")).as("total_cents"))
  }

  private val widenCache = new TempRootCache("graft_widen")

  /** TYPE-WIDENING evolution end-to-end ([[graft.tables.Evolve
    * .widenColumn]]): the daily rollup's `total_cents` metric starts
    * life as INT (the first epoch's files store 32-bit values — the
    * money-in-cents convention before anyone thought a day could
    * exceed 2³¹ cents), the registry widens it to LONG in ONE
    * metadata write — zero data files rewritten — and the second
    * epoch appends 64-bit values natively. The evolved read must
    * upcast the narrow epoch's physical INT32 exactly (parquet type
    * promotion under the explicit registry schema) and serve one
    * seamless LONG column; the oracle is the plain daily recompute,
    * so any loss, truncation, or epoch seam would hash-mismatch.
    */
  def widenedDaily(spark: SparkSession, dir: String): DataFrame = {
    val root = widenCache.root(spark, dir) { p =>
      val ev = graft.Tables.events(spark, dir)
      val mid = midDate(spark, dir)
      val ms = unix_millis(col("ts"))
      val grain = 24L * hourMs
      val keyed = ev.withColumn("d", to_date(col("ts")))
        .withColumn("window_start_ms", ms - pmod(ms, lit(grain)))
      keyed.filter(col("d") < lit(mid))
        .groupBy(col("window_start_ms"), col("event_type"))
        .agg(count(lit(1)).as("order_count"),
          sum(col("value_cents")).cast("int").as("total_cents"))
        .write.mode("overwrite").parquet(p)
      graft.tables.Evolve.register(spark, p, spark.read.parquet(p).schema)
      graft.tables.Evolve.widenColumn(spark, p, "total_cents",
        org.apache.spark.sql.types.LongType)
      keyed.filter(col("d") >= lit(mid))
        .groupBy(col("window_start_ms"), col("event_type"))
        .agg(count(lit(1)).as("order_count"),
          sum(col("value_cents")).as("total_cents"))
        .write.mode("append").parquet(p)
    }
    graft.tables.Evolve.read(spark, root)
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(sum(col("order_count")).as("order_count"),
        sum(col("total_cents")).as("total_cents"))
  }

  private val streamRootCache = new TempRootCache("graft_serving_stream")

  /** A serving root built by the STREAMING refresh leg: first batch
    * via [[Serving.materializeInto]], the rest as id-ordered
    * micro-batches through [[Serving.refreshWithBatch]] — the exact
    * `foreachBatch` body of
    * [[graft.streaming.StreamingPipeline.servingRefreshSink]] (the
    * `q_doc_curate_stream` harness pattern; the live MemoryStream +
    * checkpoint + replay leg is ServingSpec's). Cached per dataset
    * fingerprint so repeated gate/bench invocations reuse one build.
    */
  private def streamBuiltRoot(spark: SparkSession, dir: String): String =
    streamRootCache.root(spark, dir) { root =>
      val ev = graft.Tables.events(spark, dir)
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val cuts = Seq(maxId / 3, 2 * maxId / 3)
      Serving.materializeInto(spark, root,
        ev.filter(col("event_id") <= cuts(0)))
      Serving.refreshWithBatch(spark, root,
        ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1)),
        batchId = 1L)
      Serving.refreshWithBatch(spark, root,
        ev.filter(col("event_id") > cuts(1)), batchId = 2L)
      ()
    }

  /** Trending top-K read from a STREAM-BUILT serving root: the
    * minute-rollup state accumulates through the incremental refresh
    * leg instead of a one-shot build, then the identical sliding
    * re-aggregation runs over it — hash-gating the
    * stream-refresh → state → derive composition against the same
    * raw-scan oracle as `q_topk_trending`.
    */
  def topKTrendingStream(spark: SparkSession, dir: String): DataFrame =
    trendingOfRollup(
      spark.read.parquet(s"${streamBuiltRoot(spark, dir)}/rollup_1m"))

  /** WAU curve SERVED from the minute-grain distinct-user state:
    * `rollup_1m_users` holds every (minute, type, user) ever seen,
    * so collapsing it to (user, day) reproduces the raw distinct
    * (user, day) set EXACTLY and the same ×7 expand/count yields the
    * raw-scan curve bit-for-bit — engagement curves off state, not
    * the fact. Shares the raw-scan gate's oracle.
    */
  def wauServed(spark: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.wauOf(
      Serving.readTable(spark, dir, "rollup_1m_users")
        .select(col("user_id"),
          org.apache.spark.sql.functions.expr("window_start_ms DIV 86400000").as("day"))
        .distinct())

  val queries: Map[String, QFn] = Map(
    "q_wau_served" -> (wauServed _),
    "q_topk_trending_served" -> (topKTrendingServed _),
    "q_topk_trending_stream" -> (topKTrendingStream _),
    "q_topk_decayed_served" -> (topKDecayedServed _),
    "q_topk_decayed_stream" -> (topKDecayedStream _),
    "q_topk_lookup_served" -> (topKLookupServed _),
    "q_topk_lookup_replica" -> (topKLookupReplica _),
    "q_topk_lookup_revenue" -> (topKLookupRevenue _),
    "q_routed_daily" -> (routedDaily _),
    "q_tiered_daily" -> (tieredDaily _),
    "q_tiered_stream" -> (tieredStreamDaily _),
    "q_tiered_pipeline" -> (tieredPipelineDaily _),
    "q_evolved_daily" -> (evolvedDaily _),
    "q_widened_daily" -> (widenedDaily _),
    "q_hybrid_hourly" -> (hybridHourly _),
    "q_hybrid_tiered" -> (hybridTiered _),
    "q_tiered_recent" -> (tieredRecent _),
    "q_tiered_recent_served" -> (tieredRecentServed _),
    "q_cumulate_daily_routed" -> (cumulateDailyRouted _),
    "q_percentile_served" -> (percentilesServed _),
    "q_startree_by_type" -> (starTreeByType _),
    "q_startree_profile" -> (starTreeProfile _),
    "q_routed_profile" -> (routedProfile _),
  )

  private val cents = "CAST(round(value*100) AS BIGINT)"

  /** Hour-grain shift-decay, recomputed from raw events — the mirror
    * for both the served and stream-built decayed boards (weight =
    * 2^20 >> min(hour-age DIV 12h, 20), anchored at the latest hour
    * bucket, the exact chain [[decayedOfAgg]] runs over state).
    */
  private val decayedMirrorOracle =
    """WITH h AS (SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS hms,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |a AS (SELECT max(hms) AS anchor FROM h),
      |s AS (SELECT user_id,
      |    CAST(sum(n * (1048576 >> least((a.anchor - hms) // 43200000, 20)))
      |      AS BIGINT) AS score_micro,
      |    CAST(sum(n) AS BIGINT) AS n_events
      |  FROM h CROSS JOIN a GROUP BY 1)
      |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, user_id ASC)
      |    AS BIGINT) AS rank,
      |  user_id, score_micro, n_events
      |FROM s ORDER BY rank LIMIT 10""".stripMargin

  /** Oracles recompute the same ranked tables from raw events in SQL,
    * so the materialized path is checked end-to-end (build + read).
    */
  val oracles: Map[String, String] = Map(
    // the routed form must match the RAW-expand oracle bit-for-bit —
    // same SQL as q_cumulate_daily, different (serving-table) plan
    "q_cumulate_daily_routed" -> OlapQueries.oracles("q_cumulate_daily"),
    // served trending must equal the raw-scan trending bit-for-bit —
    // same oracle, different (minute-rollup re-aggregation) plan
    "q_topk_trending_served" -> AnalyticsQueries.oracles("q_topk_trending"),
    // the stream-built root must reproduce the same trending table —
    // same oracle, state accumulated via the incremental refresh leg
    "q_topk_trending_stream" -> AnalyticsQueries.oracles("q_topk_trending"),
    // hour-grain shift-decay mirror: the half-life (12 h) is a
    // multiple of the state grain (1 h) and the anchor is the latest
    // state window, so the served re-aggregation is exact — the
    // oracle recomputes the identical integer chain from raw events
    // at hour grain; the stream leg shares it (same state, refreshed
    // incrementally)
    "q_topk_decayed_served" -> decayedMirrorOracle,
    "q_topk_decayed_stream" -> decayedMirrorOracle,
    // served WAU ≡ raw-scan WAU (minute-user state collapses to the
    // exact distinct (user, day) set)
    "q_wau_served" -> AnalyticsQueries.oracles("q_wau_daily"),
    // same binned-quantile definition recomputed from raw events:
    // `100*cum >= p*n` is the integer spelling of cum >= ceil(p%*n),
    // and DuckDB's `//` floor-division matches Spark's DIV on the
    // non-negative cents domain — so the served estimate hash-checks
    // exactly, no tolerance band
    "q_percentile_served" ->
      s"""WITH f AS (
         |  SELECT event_type, $cents // 100 AS bin
         |  FROM events
         |  WHERE epoch_ms(date_trunc('minute', ts)) >
         |        (SELECT epoch_ms(max(ts)) FROM events) - 24*3600*1000),
         |h AS (SELECT event_type, bin, count(*) AS c FROM f GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
         |cum AS (SELECT event_type, bin,
         |          sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
         |        FROM h),
         |sel AS (
         |  SELECT c.event_type, p.p, CAST(min(c.bin)*100 AS BIGINT) AS est
         |  FROM cum c JOIN t USING (event_type)
         |  CROSS JOIN (VALUES (50), (90), (99)) AS p(p)
         |  WHERE c.cum * 100 >= p.p * t.n
         |  GROUP BY 1, 2)
         |SELECT s.event_type, t.n,
         |  MAX(CASE WHEN p = 50 THEN est END) AS p50_cents,
         |  MAX(CASE WHEN p = 90 THEN est END) AS p90_cents,
         |  MAX(CASE WHEN p = 99 THEN est END) AS p99_cents
         |FROM sel s JOIN t USING (event_type)
         |GROUP BY 1, 2""".stripMargin,
    // star-tree nodes re-checked against plain raw GROUP BYs: node
    // build (base agg + cube re-agg) and gid routing must be lossless
    "q_startree_by_type" ->
      s"""SELECT event_type, count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS sum_value_cents
         |FROM events GROUP BY 1""".stripMargin,
    "q_startree_profile" ->
      s"""SELECT CAST(isodow(ts) AS BIGINT) AS day_of_week_iso,
         |  CAST(hour(ts) AS BIGINT) AS hour_of_day,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS sum_value_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_routed_profile" ->
      s"""SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS sum_value_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_routed_daily" ->
      s"""SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // the tiered read must reproduce the raw fact exactly — same
    // recompute as q_routed_daily, different physical source
    "q_tiered_daily" ->
      s"""SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // ingest-twin: the incrementally-built + demoted + backfilled root
    // must serve the identical answer
    "q_tiered_stream" ->
      s"""SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // the landing→absorb→demote lifecycle (streaming raw leg + tick)
    // must serve the identical answer too
    "q_tiered_pipeline" ->
      s"""SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // schema evolution: pre-evolution days answer total_cents with the
    // registered default (0), post-evolution days with real values —
    // the oracle replays the same mid-range epoch split
    "q_evolved_daily" ->
      s"""WITH b AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events),
         |c AS (SELECT lo + CAST(FLOOR(date_diff('day', lo, hi) / 2) AS INT) AS mid FROM b)
         |SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM(CASE WHEN CAST(ts AS DATE) < (SELECT mid FROM c)
         |           THEN 0 ELSE $cents END) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // type widening: both epochs carry REAL values (the narrow epoch
    // just stores them 32-bit), so the evolved read must equal the
    // plain daily recompute — any truncation or epoch seam mismatches
    "q_widened_daily" ->
      s"""SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_hybrid_hourly" ->
      s"""SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // same pure-raw recompute: the hybrid seam AND the tier boundary
    // must both vanish from the answer
    "q_hybrid_tiered" ->
      s"""SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
         |  count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    // the recent-window serving read through the tiers: the archive's
    // existence must change neither the answer nor (bench-measured)
    // the latency class
    "q_tiered_recent" ->
      s"""SELECT event_type, count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events
         |WHERE epoch_ms(ts) >= (SELECT epoch_ms(max(ts)) FROM events)
         |  - 24::BIGINT*3600*1000
         |GROUP BY 1""".stripMargin,
    // the rollup-fed twin: complete minutes from state, the boundary
    // minute through the tiers — the serve-from-rollup seam must be
    // invisible, so it shares the raw recompute oracle
    "q_tiered_recent_served" ->
      s"""SELECT event_type, count(*) AS order_count,
         |  CAST(SUM($cents) AS BIGINT) AS total_cents
         |FROM events
         |WHERE epoch_ms(ts) >= (SELECT epoch_ms(max(ts)) FROM events)
         |  - 24::BIGINT*3600*1000
         |GROUP BY 1""".stripMargin,
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
    // the replica route reads a byte-identical copy of the same
    // table, so the oracle is the served lookup's — the gate then
    // checks replicate + route + read end-to-end
    "q_topk_lookup_replica" ->
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
