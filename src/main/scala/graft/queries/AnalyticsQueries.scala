package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral-analytics queries over the events stream — the funnel /
  * cohort surface a user of the reference's OLAP store (raw events in
  * Pinot, `pinot/README.md` §Sample Queries) would express as
  * query-time SQL. Both are classic "real-time user analytics on an
  * event table" shapes (the reference's stated use case,
  * `README.md` §Overview).
  *
  * Scale notes (100 TB):
  *  - both ops reduce on `user_id` FIRST (one hash shuffle with
  *    map-side partial aggregation); the second aggregation is over
  *    a domain bounded by stages × cohort-days — kilobytes — so the
  *    second exchange is negligible no matter the input size.
  *  - the funnel's per-user state is four timestamps (conditional
  *    `min`), not an event list: no `collect_list`, no sort, no skew
  *    sensitivity beyond the user-key distribution itself.
  *  - cohort assignment is a window `min` over `user_id` — one
  *    shuffle, no self-join of a per-user cohort table back onto the
  *    fact; the retention count's second shuffle carries only the
  *    DISTINCT (cohort, offset, user) triples, which partial
  *    aggregation dedups map-side to at most one row per user-day.
  */
object AnalyticsQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** First-touch conversion funnel signup → view → click → purchase:
    * a user reaches stage k when the first occurrence of each step is
    * strictly ordered after the first occurrence of the previous step
    * (first-touch semantics — the common approximation that needs only
    * one conditional-min pass, not per-sequence matching). Reports
    * users reaching each stage (stage 0 = any activity).
    *
    * Timestamps compare at microsecond grain — the engine's native
    * precision for this source (Tables.events floors the parquet's
    * nanos to micros).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def firstUs(tpe: String) =
      min(when(col("event_type") === tpe, unix_micros(col("ts")))).as(s"t_$tpe")
    val perUser = ev.groupBy(col("user_id"))
      .agg(firstUs("signup"), firstUs("view"), firstUs("click"), firstUs("purchase"))
    val staged = perUser.select(
      (when(col("t_signup").isNotNull, 1L).otherwise(0L) +
        when(col("t_signup") < col("t_view"), 1L).otherwise(0L) +
        when(col("t_signup") < col("t_view") && col("t_view") < col("t_click"), 1L)
          .otherwise(0L) +
        when(col("t_signup") < col("t_view") && col("t_view") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1L).otherwise(0L)).as("max_stage"))
    // collapse to <=5 rows FIRST, then the cumulative "users at or
    // beyond stage" is a trivial 5x5 triangular join — never a
    // nested-loop against the per-user frame
    val counts = staged.groupBy(col("max_stage")).agg(count(lit(1)).as("n"))
    val stages = spark.range(0, 5).toDF("stage")
    stages.join(counts, col("max_stage") >= col("stage"), "left")
      .groupBy(col("stage"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_users"))
  }

  /** Daily cohort retention: cohort = the UTC day index of a user's
    * first event; for each (cohort_day, day_offset) count the distinct
    * users active that many days after their first touch. Day index is
    * integer `epoch_us DIV 86_400_000_000` so both engines do exact
    * integer arithmetic (no timezone/date types on the wire).
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      // integer DIV — `/` on longs is double division in Spark
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    ev.withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val queries: Map[String, QFn] = Map(
    "q_funnel" -> (funnel _),
    "q_cohort_retention" -> (cohortRetention _),
  )

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'signup')   AS t_signup,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'view')     AS t_view,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'click')    AS t_click,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS t_purchase
        |  FROM events GROUP BY 1),
        |staged AS (
        |  SELECT
        |    (CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN t_signup < t_view THEN 1 ELSE 0 END
        |     + CASE WHEN t_signup < t_view AND t_view < t_click THEN 1 ELSE 0 END
        |     + CASE WHEN t_signup < t_view AND t_view < t_click AND t_click < t_purchase
        |            THEN 1 ELSE 0 END)::BIGINT AS max_stage
        |  FROM per_user)
        |SELECT stage, count(max_stage) AS n_users
        |FROM range(0, 5) AS r(stage) LEFT JOIN staged ON max_stage >= stage
        |GROUP BY 1""".stripMargin,
    "q_cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (
        |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM d)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin,
  )
}
