package graft

import org.apache.spark.sql.functions._
import graft.serving.Router

/** Grain-aware routing: the right source is picked per grain, routed
  * results are bit-equal to raw recomputation, and the hourly route's
  * plan reads ONLY the materialized serving table — never the raw
  * fact.
  */
class RouterSpec extends SparkSuite {

  private val hourMs = graft.serving.Serving.hourMs

  test("route selection: coarsest divisible grain wins") {
    assert(Router.route(24 * hourMs) === Router.HourlyServing)
    assert(Router.route(hourMs) === Router.HourlyServing)
    // no materialized 1m rollup in this layout → recomputing one from
    // raw would be worse than the Raw route
    assert(Router.route(5 * 60 * 1000L) === Router.Raw)
    assert(Router.route(5 * 60 * 1000L, has1mRollup = true) === Router.Rollup1m)
    assert(Router.route(90 * 1000L, has1mRollup = true) === Router.Raw)
    assert(Router.route(1234L) === Router.Raw)
  }

  test("re-aggregation from a materialized 1m rollup ≡ raw recomputation") {
    val rollup = graft.ops.Rollup.rollup1m(Tables.events(spark, sfDir))
    val grain = 5 * 60 * 1000L
    val fromRollup = Router.aggregateFromRollup1m(rollup, grain)
      .collect().map(_.toSeq).toSet
    val raw = Tables.events(spark, sfDir)
      .groupBy((unix_millis(col("ts")) - pmod(unix_millis(col("ts")), lit(grain)))
          .as("window_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
      .collect().map(_.toSeq).toSet
    assert(fromRollup === raw)
  }

  test("routed results ≡ raw recomputation at every grain") {
    def direct(grainMs: Long) = Tables.events(spark, sfDir)
      .groupBy((unix_millis(col("ts")) - pmod(unix_millis(col("ts")), lit(grainMs)))
          .as("window_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
    for (grain <- Seq(24 * hourMs, hourMs, 5 * 60 * 1000L, 90 * 1000L)) {
      val routed = Router.aggregateByType(spark, sfDir, grain)
        .collect().map(_.toSeq).toSet
      val raw = direct(grain).collect().map(_.toSeq).toSet
      assert(routed === raw, s"grain $grain")
      assert(raw.nonEmpty)
    }
  }

  test("hybrid serving: rollup history + raw tail, pushed time filter on the tail") {
    val df = graft.serving.Router.hybridHourlyByType(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("agg_keyed_by_window"), plan)
    assert(plan.contains("events.parquet"), plan)
    // the raw leg must scan only the tail: the floor applies to the
    // raw ns column pre-derivation, so the range predicate PUSHES
    assert(plan.contains("GreaterThanOrEqual(ts"), plan)
  }

  test("hybrid-through-tiers: same answer, and the recent-window tail opens zero cold files") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    // a tiered events root split mid-range, the q_tiered_daily shape
    val root = java.nio.file.Files.createTempDirectory("router_tiered").toString
    val ev = Tables.events(spark, sfDir)
    val sortCols = Seq("event_type", "ts")
    graft.serving.Tiered.build(spark, ev, root, "ts", sortCols, Some("event_id"))
    val r = ev.agg(min(to_date(col("ts"))), max(to_date(col("ts")))).head()
    val (lo, hi) = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
    val cutoff = lo.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2).toString
    graft.serving.Tiered.demote(spark, root, cutoff, sortCols,
      coldBloomCols = Seq("user_id"))
    // the composed route answers exactly like the untiered hybrid
    // (which itself shares the pure-raw oracle)
    val tiered = Router.hybridHourlyByTypeTiered(spark, sfDir, root)
    val base = Router.hybridHourlyByType(spark, sfDir)
    assert(tiered.collect().map(_.toSeq).toSet ===
      base.collect().map(_.toSeq).toSet)
    // and its raw tail never crosses the tier boundary: the archive's
    // existence costs the serving path nothing
    val scans = findScans(tiered.queryExecution.executedPlan)
    val cold = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("/cold")))
    assert(cold.nonEmpty, "composed plan lost the tiered raw arm")
    assert(cold.map(_.metrics("numFiles").value).sum === 0L,
      "recent-window tail opened cold files")
    val hot = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("/hot")))
    assert(hot.map(_.metrics("numFiles").value).sum > 0L,
      "tail read nothing hot — seam misplaced")
  }

  test("rollup-fed CUMULATE ≡ raw-expand CUMULATE and reads only the serving table") {
    val routed = Router.cumulateDailyFromHourly(spark, sfDir)
    val raw = graft.queries.OlapQueries.cumulateDaily(spark, sfDir)
    assert(routed.collect().map(_.toSeq).toSet === raw.collect().map(_.toSeq).toSet)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("agg_keyed_by_window"), plan)
    assert(!plan.contains("events.parquet"),
      "rollup-fed CUMULATE must not touch the raw fact\n" + plan)
  }

  test("composed dim+grain routing: star-tree arm reads exactly one node dir") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val df = Router.aggregateProfile(spark, sfDir, Seq("event_type", "hour_of_day"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("graft_startree"),
      "profile-shaped request must route to the star-tree\n" + plan)
    // all 8 gid directories exist; the routed read touches exactly 1
    val scans = findScans(plan)
    assert(scans.nonEmpty)
    assert(scans.map(_.metrics("numPartitions").value).max === 1L,
      "routed node read touched more than one gid directory")
  }

  test("composed routing: grain arm uses the serving table, untreed dim falls to raw") {
    // day grain over event_type → hourly serving table, renamed metric
    val day = Router.aggregateProfile(spark, sfDir, Seq("event_type"),
      grainMs = 24 * hourMs)
    val dayPlan = day.queryExecution.executedPlan.toString
    assert(dayPlan.contains("agg_keyed_by_window") &&
      !dayPlan.contains("events.parquet"), dayPlan)
    val raw = Tables.events(spark, sfDir)
      .groupBy((unix_millis(col("ts")) - pmod(unix_millis(col("ts")),
          lit(24 * hourMs))).as("window_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("sum_value_cents"))
    assert(day.collect().map(_.toSeq).toSet === raw.collect().map(_.toSeq).toSet)
    // user_id is outside the tree by contract → raw arm, same numbers
    val byUser = Router.aggregateProfile(spark, sfDir, Seq("user_id"))
    assert(byUser.queryExecution.executedPlan.toString.contains("events.parquet"))
    val rawUser = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("sum_value_cents"))
    assert(byUser.collect().map(_.toSeq).toSet ===
      rawUser.collect().map(_.toSeq).toSet)
  }

  test("the hourly route scans the serving table, not the raw fact") {
    val df = Router.aggregateByType(spark, sfDir, 24 * hourMs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("agg_keyed_by_window"), plan)
    assert(!plan.contains("events.parquet"),
      "daily aggregate must not touch the raw fact\n" + plan)
  }
}
