package graft

import org.apache.spark.sql.functions._
import graft.queries.OlapQueries

/** OLAP surface invariants: window-frame arithmetic, cube grain
  * counts, pivot conservation, sketch tolerance predicates.
  */
class OlapSpec extends SparkSuite {
  import spark.implicits._

  test("moving 7-day window equals a self-join recompute") {
    val got = OlapQueries.movingRevenue(spark, sfDir)
    val daily = got.select($"event_type", $"day_ms", $"day_cents")
    val expected = daily.as("a").join(daily.as("b"),
        $"a.event_type" === $"b.event_type" &&
        $"b.day_ms".between($"a.day_ms" - 6L * 86400000, $"a.day_ms"))
      .groupBy($"a.event_type".as("event_type"), $"a.day_ms".as("day_ms"))
      .agg(sum($"b.day_cents").as("trail7_cents"), count(lit(1)).as("trail7_days"))
    val cols = Seq("event_type", "day_ms", "trail7_cents", "trail7_days").map(col)
    assert(got.select(cols: _*).exceptAll(expected.select(cols: _*)).isEmpty)
    assert(expected.count() === got.count())
  }

  test("cube emits all four grains with consistent totals and gids") {
    val c = OlapQueries.cubeRevenue(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val nTypes = ev.select("event_type").distinct().count()
    val nHours = ev.select(hour($"ts")).distinct().count()
    val nPairs = ev.select($"event_type", hour($"ts")).distinct().count()
    assert(c.count() === nPairs + nTypes + nHours + 1)
    // grand-total row (gid=3) carries the global aggregates
    val total = c.filter($"gid" === 3).select("order_count", "sum_value_cents")
      .as[(Long, Long)].head()
    assert(total === ((ev.count(), ev.agg(sum($"value_cents")).head.getLong(0))))
    // each finer grain re-sums to the same global revenue
    Seq(0, 1, 2).foreach { g =>
      assert(c.filter($"gid" === g).agg(sum($"sum_value_cents")).head.getLong(0)
        === total._2, s"gid=$g")
    }
  }

  test("pivot counts conserve the per-user event count") {
    val p = OlapQueries.pivotUserTypes(spark, sfDir)
    val perUser = Tables.events(spark, sfDir).groupBy("user_id").count()
    val mism = p.withColumn("n_sum",
        $"n_click" + $"n_view" + $"n_purchase" + $"n_signup" + $"n_error")
      .join(perUser, Seq("user_id"))
      .filter($"n_sum" =!= $"count")
    assert(mism.isEmpty)
  }

  test("histogram buckets are in range and conserve count and revenue") {
    val h = OlapQueries.valueHistogram(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
    assert(h.filter($"bucket" < 0 || $"bucket" >= 20).isEmpty)
    assert(h.agg(sum($"n_events")).head.getLong(0) === ev.count())
    assert(h.agg(sum($"bucket_cents")).head.getLong(0)
      === ev.agg(sum($"value_cents")).head.getLong(0))
    h.unpersist()
  }

  test("gap-fill spine is dense, conserves totals, forward-fill is total") {
    val g = OlapQueries.gapfillMinutes(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
    // dense spine: per type, rows == (max-min)/step + 1 and minutes
    // are exactly the arithmetic progression (sum check)
    val spine = g.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"minute_ms").as("mn"),
        max($"minute_ms").as("mx"), sum($"minute_ms").as("s"))
      .filter($"n" =!= ($"mx" - $"mn") / 60000L + 1L ||
        $"s" =!= ($"mn" + $"mx") * $"n" / 2L)
    assert(spine.isEmpty)
    // zero-filled gaps carry no events; totals conserve the raw table
    assert(g.filter($"is_gap" === 1 && ($"n_events" =!= 0 || $"minute_cents" =!= 0)).isEmpty)
    assert(g.agg(sum($"n_events")).head.getLong(0) === ev.count())
    assert(g.agg(sum($"minute_cents")).head.getLong(0)
      === ev.agg(sum($"value_cents")).head.getLong(0))
    // forward fill: never null, and equals the observed value on
    // non-gap rows
    assert(g.filter($"filled_cents".isNull).isEmpty)
    assert(g.filter($"is_gap" === 0 && $"filled_cents" =!= $"minute_cents").isEmpty)
    g.unpersist()
  }

  test("distributed globalRowNumber/globalNtile equal the window functions") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Rank
    val totals = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(sum($"value_cents").as("total_cents"))
    val order = Seq($"total_cents".desc, $"user_id".asc)
    val w = Window.orderBy(order: _*)
    val want = totals
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("tile", ntile(7).over(w).cast("long"))
      .select("user_id", "rn", "tile").as[(Long, Long, Long)].collect().toMap2
    // force many range partitions so ranks genuinely cross partitions
    val rn = Rank.globalRowNumber(totals, order, partitions = 7)
      .select("user_id", "rn").as[(Long, Long)].collect().toMap
    val tile = Rank.globalNtile(totals, order, n = 7, partitions = 5)
      .select("user_id", "tile").as[(Long, Long)].collect().toMap
    assert(want.map { case (u, (r, _)) => u -> r } === rn)
    assert(want.map { case (u, (_, t)) => u -> t } === tile)
    // fewer rows than buckets: tile = rank
    val tiny = totals.limit(3)
    val tt = Rank.globalNtile(tiny, order, n = 10)
      .select("tile").as[Long].collect().toSet
    assert(tt === Set(1L, 2L, 3L))
  }

  test("globalRowNumber survives 1000 range partitions (map-literal offsets, no codegen fallback)") {
    import graft.ops.Rank
    val totals = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(sum($"value_cents").as("total_cents"))
    val order = Seq($"total_cents".desc, $"user_id".asc)
    val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
    val want = totals.withColumn("rn", row_number().over(w).cast("long"))
      .select("user_id", "rn").as[(Long, Long)].collect().toMap
    // a realistic cluster shuffle-partition count; the old nested
    // when-chain built a 1000-deep expression tree here
    val got = Rank.globalRowNumber(totals, order, partitions = 1000)
      .select("user_id", "rn").as[(Long, Long)].collect().toMap
    assert(got === want)
    // The offset mechanism — element_at over a 1000-entry map LITERAL
    // — must stay inside whole-stage codegen (the when-chain it
    // replaced blew the generated-method size at this width).
    val offsets = (0 until 1000).map(pid => pid -> pid.toLong * 7).toMap
    val probe = spark.range(0, 100, 1, 8)
      .withColumn("_pid", spark_partition_id())
      .withColumn("off", element_at(typedLit(offsets), $"_pid"))
    probe.collect()
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan
    // string; the offset projection must carry one (no fallback).
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("element_at")),
      plan.take(500))
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(t => (t._1, (t._2, t._3))).toMap
  }

  test("pivot and user-gaps plan exactly one shuffle (no totals join, exchange reuse)") {
    def finalShuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      "Exchange hashpartitioning".r.findAllIn(plan).size
    }
    val pivot = OlapQueries.pivotUserTypes(spark, sfDir)
    assert(finalShuffles(pivot) === 1)
    assert(!pivot.queryExecution.executedPlan.toString.contains("Join"))
    // window on user_id then groupBy(user_id): the agg reuses the
    // window's partitioning instead of shuffling again
    assert(finalShuffles(OlapQueries.userGaps(spark, sfDir)) === 1)
  }

  test("corr moments fail loudly when a DECIMAL sum exceeds the BIGINT wire") {
    import java.sql.Timestamp
    // in-domain: guard is transparent
    val ok = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 300L),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "click", 500L))
      .toDF("event_id", "ts", "user_id", "event_type", "value_cents")
    val row = OlapQueries.corrComponentsOf(ok)
      .select("sum_x", "sum_xx").as[(Long, Long)].head()
    assert(row === ((800L, 300L * 300L + 500L * 500L)))
    // x² at 10¹⁵ cents is 10³⁰ — far past Long.MaxValue: the non-ANSI
    // cast would silently wrap/null where DuckDB's HUGEINT raises;
    // the guard makes Spark raise too
    val over = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click",
        1000000000000000L))
      .toDF("event_id", "ts", "user_id", "event_type", "value_cents")
    val ex = intercept[Exception] {
      OlapQueries.corrComponentsOf(over).collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("BIGINT wire domain"))
  }

  test("sketch estimates sit inside the est_ok envelope") {
    val pe = OlapQueries.percentileEst(spark, sfDir)
    assert(pe.filter($"p50_ok" =!= 1 || $"p95_ok" =!= 1).isEmpty)
    val di = OlapQueries.distinctIntersectHll(spark, sfDir)
    assert(di.filter($"est_ok" =!= 1).isEmpty)
    assert(di.select("both_exact").as[Long].head() > 0)
  }
}
