package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** Semantics of the behavioral-analytics ops on controlled synthetic
  * users — the edge cases the corpus oracle can't isolate: out-of-order
  * funnel steps, missing stages, burst boundaries exactly at the span.
  */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)

  test("funnel: out-of-order and missing steps stage correctly") {
    // A: full ordered funnel → stage 4
    // B: view BEFORE signup → stops at stage 1 (signup exists,
    //    but first view precedes first signup)
    // C: no signup at all → stage 0
    // D: signup → view, nothing later → stage 2
    val ev = Seq(
      (1L, "signup", ts(0)), (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(0)), (2L, "signup", ts(1)), (2L, "click", ts(2)),
      (3L, "view", ts(0)), (3L, "purchase", ts(1)),
      (4L, "signup", ts(0)), (4L, "view", ts(5))
    ).toDF("user_id", "event_type", "ts")
    val stages = AnalyticsQueries.funnelOf(spark, ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stages === Map(0L -> 4L, 1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("funnel: equal first-touch timestamps do NOT advance (strict order)") {
    val ev = Seq(
      (1L, "signup", ts(1)), (1L, "view", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val stages = AnalyticsQueries.funnelOf(spark, ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stages(1L) === 1L) // signup counted; simultaneous view doesn't
  }

  test("bursts: boundary at exactly the 24h span is included, beyond is not") {
    val h = 60 // minutes per hour
    val ev = Seq(
      // user 1: errors 24h apart exactly → one qualifying pair
      (1L, "error", ts(0), 10L), (1L, "error", ts(24 * h), 11L),
      // user 2: errors 24h + 1min apart → no burst
      (2L, "error", ts(0), 20L), (2L, "error", ts(24 * h + 1), 21L),
      // user 3: three errors inside a day → two qualifying rows
      (3L, "error", ts(0), 30L), (3L, "error", ts(10), 31L), (3L, "error", ts(20), 32L),
      // non-error events never count
      (2L, "click", ts(5), 22L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val res = AnalyticsQueries.errorBurstsOf(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res === Map(1L -> 1L, 3L -> 2L))
  }

  test("funnel: property — Spark op ≡ in-memory reference on random event sets") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val types = Seq("signup", "view", "click", "purchase", "error")
    val genEvents = for {
      n <- Gen.choose(1, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 8L)
        t <- Gen.oneOf(types)
        m <- Gen.choose(0, 500)
      } yield (u, t, m))
    } yield evs
    def refStage(evs: Seq[(Long, String, Int)], u: Long): Long = {
      def first(t: String) =
        evs.filter(e => e._1 == u && e._2 == t).map(_._3).minOption
      val (s, v, c, p) =
        (first("signup"), first("view"), first("click"), first("purchase"))
      def lt(a: Option[Int], b: Option[Int]) =
        a.isDefined && b.isDefined && a.get < b.get
      var stage = 0L
      if (s.isDefined) stage += 1
      if (lt(s, v)) stage += 1
      if (lt(s, v) && lt(v, c)) stage += 1
      if (lt(s, v) && lt(v, c) && lt(c, p)) stage += 1
      stage
    }
    val prop = Prop.forAll(genEvents) { evs =>
      val df = evs.toDF("user_id", "event_type", "m")
        .select($"user_id", $"event_type",
          timestamp_micros($"m".cast("long") * 1000000L).as("ts"))
      val got = AnalyticsQueries.funnelOf(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val users = evs.map(_._1).distinct
      val stages = users.map(u => refStage(evs, u))
      val want = (0L to 4L).map(s => s -> stages.count(_ >= s).toLong).toMap
      got == want
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("OHLC: property — Spark op ≡ in-memory reference (ties broken by id)") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val genEvents = for {
      n <- Gen.choose(1, 60)
      evs <- Gen.listOfN(n, for {
        id <- Gen.choose(1L, 1000L)
        t <- Gen.choose(0, 300) // minutes, spans ~5 hours
        v <- Gen.choose(-50L, 5000L)
        tp <- Gen.oneOf("a", "b")
      } yield (id, t, v, tp))
    } yield evs.distinctBy(_._1) // unique event ids
    val prop = Prop.forAll(genEvents) { evs =>
      val df = evs.toDF("event_id", "m", "value_cents", "event_type")
        .select($"event_id", timestamp_micros($"m".cast("long") * 60000000L).as("ts"),
          $"value_cents", $"event_type")
      val got = graft.queries.OlapQueries.ohlcOf(df)
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      val want = evs.groupBy(e => (e._2 / 60 * 3600000L, e._4)).map { case (k, g) =>
        val ordered = g.sortBy(e => (e._2, e._1)) // (time, id) tie-break
        k -> (ordered.head._3, ordered.last._3,
          g.map(_._3).max, g.map(_._3).min, g.size.toLong)
      }
      got == want
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("sliding windows: each event lands in exactly size/slide windows") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .count().agg(sum("count")).head().getLong(0)
    val n = Tables.events(spark, sfDir).count()
    assert(counts === 4 * n)
  }

  test("transitions: adjacent pairs per user, permille normalized per from-type") {
    // user 1: a->b->a (order by ts, then event_id on the tie at ts(1))
    // user 2: b->a; a lone user-3 event contributes nothing
    val ev = Seq(
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(1)), (1L, 12L, "a", ts(1)),
      (2L, 20L, "b", ts(0)), (2L, 21L, "a", ts(5)),
      (3L, 30L, "a", ts(0))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = AnalyticsQueries.eventTransitionsOf(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // transitions: a->b (u1), b->a (u1 tie-broken by event_id, u2)
    assert(got === Map(
      ("a", "b") -> (1L, 1000L),
      ("b", "a") -> (2L, 1000L)))
  }

  test("trigrams: consecutive triples per user under the (ts, id) order") {
    // user 1 path a b a b -> triples (a,b,a), (b,a,b); user 2's two
    // events form no triple; ranks tie-break lexicographically
    val ev = Seq(
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(1)),
      (1L, 12L, "a", ts(2)), (1L, 13L, "b", ts(3)),
      (2L, 20L, "b", ts(0)), (2L, 21L, "a", ts(5))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = AnalyticsQueries.eventTrigramsOf(ev)
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", "b", "a", 1L),
      (2L, "b", "a", "b", 1L)))
  }

  test("session transitions: cross-session pairs drop, within-session kept") {
    // user 1: a@0m -> b@10m (kept), b@10m -> c@50m (40-min gap:
    // DROPPED), c@50m -> a@60m (kept); the exact 30-min boundary is
    // IN-session (<=), matching TemporalQueries.sessionize
    val ev = Seq(
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(10)),
      (1L, 12L, "c", ts(50)), (1L, 13L, "a", ts(60)),
      (2L, 20L, "b", ts(0)), (2L, 21L, "a", ts(30))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = AnalyticsQueries.sessionTransitionsOf(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      ("a", "b") -> (1L, 1000L),
      ("c", "a") -> (1L, 1000L),
      ("b", "a") -> (1L, 1000L)))
  }

  test("transitions: property — Spark op ≡ in-memory reference, partition-invariant") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val genEvents = for {
      n <- Gen.choose(2, 80)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        t <- Gen.oneOf("a", "b", "c")
        m <- Gen.choose(0, 50)
      } yield (u, t, m))
    } yield evs.zipWithIndex.map { case ((u, t, m), i) => (u, i.toLong, t, m) }
    val prop = Prop.forAll(genEvents) { evs =>
      val df = evs.toDF("user_id", "event_id", "event_type", "m")
        .select($"user_id", $"event_id", $"event_type",
          timestamp_micros($"m".cast("long") * 60000000L).as("ts"))
        .repartition(7)
      val got = AnalyticsQueries.eventTransitionsOf(df)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val pairs = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        val ordered = g.sortBy(e => (e._4, e._2)).map(_._3)
        ordered.zip(ordered.drop(1))
      }
      val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val outTotals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
      val want = counts.map { case ((f, t), n) =>
        (f, t) -> (n, n * 1000L / outTotals(f)) }
      got == want
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("rfm: quartile assignment matches SQL NTILE; totals conserve") {
    // 8 purchasing users with strictly increasing metrics so every
    // quartile holds exactly 2 users on each dimension; user k has
    // recency rank k, frequency rank k, monetary rank k => segment
    // (q q q) with q = (k-1)/2 + 1.
    val ev = (1 to 8).flatMap { k =>
      (1 to k).map(i => (k.toLong, 100L * k + i, "purchase",
        ts(10 * k + i), k * 100L))
    }.toDF("user_id", "event_id", "event_type", "ts", "cents")
      .select($"user_id", $"event_id", $"event_type", $"ts",
        ($"cents".cast("double") / 100.0).as("value"))
      .withColumn("value_cents", round($"value" * 100).cast("long"))
    val got = AnalyticsQueries.rfmSegmentsOf(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = (1 to 8).groupBy(k => ((k - 1) / 2 + 1) * 111L).map { case (seg, ks) =>
      seg -> (ks.size.toLong, ks.map(k => k.toLong * k * 100L).sum)
    }
    assert(got === want)
    // conservation: user counts and monetary mass survive the rollup
    assert(got.values.map(_._1).sum === 8L)
  }

  test("rfm: partition invariance (tiles are a total order, not placement)") {
    val ev = Tables.events(spark, sfDir)
    val a = AnalyticsQueries.rfmSegmentsOf(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = AnalyticsQueries.rfmSegmentsOf(ev.repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
