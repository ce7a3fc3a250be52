package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Rollup

/** The reference's SQL surface: its users query Pinot tables in SQL
  * (pinot/README.md §Sample Queries). The engine's tables register as
  * Spark SQL views under the Pinot table names' analogs
  * (orders_raw → events mapping per EventQueries' domain note), and
  * the README's three sample queries run through `spark.sql` with
  * only the schema mapping and a deterministic `ago()` anchor
  * (max ts) changed — API-surface parity, not just operator parity.
  */
object SqlQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.events(spark, dir).createOrReplaceTempView("orders_raw")
    Rollup.rollup1mHll(Tables.events(spark, dir))
      .withColumn("hour_of_day", hour(timestamp_millis(col("window_start_ms"))))
      .createOrReplaceTempView("orders_1m_rollup")
  }

  /** README sample 1: top items by revenue over the raw table. */
  def topkRaw(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql("""
      SELECT event_type,
        SUM(value_cents) AS total_revenue_cents,
        COUNT(*) AS order_count
      FROM orders_raw
      WHERE ts > (SELECT max(ts) FROM orders_raw) - INTERVAL 24 HOURS
      GROUP BY event_type
      ORDER BY total_revenue_cents DESC, event_type ASC
      LIMIT 10""")
  }

  /** README sample 2: same top-k off the rollup table, with
    * DISTINCTCOUNTHLL re-merge of the stored sketches. Rows-only
    * oracle (estimate column); sums are hash-checked by sample 1 and
    * the rollup entries.
    */
  def topkRollup(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql("""
      SELECT event_type,
        SUM(sum_value_cents) AS total_revenue_cents,
        SUM(order_count) AS total_orders,
        CAST(hll_sketch_estimate(hll_union_agg(users_hll)) AS BIGINT) AS unique_customers
      FROM orders_1m_rollup
      WHERE window_start_ms > (SELECT max(window_start_ms) FROM orders_1m_rollup) - 24*3600*1000
      GROUP BY event_type
      ORDER BY total_revenue_cents DESC, event_type ASC
      LIMIT 10""")
  }

  /** README sample 3: revenue by hour of day over the rollup. */
  def revenueByHour(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql("""
      SELECT CAST(hour_of_day AS BIGINT) AS hour_of_day,
        -- 100.0D: Spark's bare 100.0 is DECIMAL, which would make this
        -- a decimal column; the reference/oracle compute in double.
        CAST(SUM(sum_value_cents) AS DOUBLE) / 100.0D AS revenue_dollars,
        SUM(order_count) AS orders
      FROM orders_1m_rollup
      WHERE window_start_ms > (SELECT max(window_start_ms) FROM orders_1m_rollup) - 7*24*3600*1000
      GROUP BY hour_of_day
      ORDER BY hour_of_day""")
  }

  val queries: Map[String, QFn] = Map(
    "q_sql_topk_raw" -> (topkRaw _),
    "q_sql_topk_rollup" -> (topkRollup _),
    "q_sql_revenue_by_hour" -> (revenueByHour _),
  )

  private val cents = "CAST(round(value*100) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    // epoch_us grain: the engine's ts precision (see Tables.events).
    "q_sql_topk_raw" ->
      s"""SELECT event_type,
         |  CAST(SUM($cents) AS BIGINT) AS total_revenue_cents,
         |  COUNT(*) AS order_count
         |FROM events
         |WHERE epoch_us(ts) > (SELECT epoch_us(max(ts)) FROM events) - 24::BIGINT*3600*1000000
         |GROUP BY event_type
         |ORDER BY total_revenue_cents DESC, event_type ASC
         |LIMIT 10""".stripMargin,
    "q_sql_revenue_by_hour" ->
      s"""WITH r AS (
         |  SELECT epoch_ms(date_trunc('minute', ts)) AS window_start_ms,
         |    CAST(hour(ts) AS BIGINT) AS hour_of_day,
         |    count(*) AS order_count,
         |    CAST(SUM($cents) AS BIGINT) AS sum_value_cents
         |  FROM events GROUP BY 1, 2)
         |SELECT hour_of_day,
         |  SUM(sum_value_cents) / 100.0 AS revenue_dollars,
         |  CAST(SUM(order_count) AS BIGINT) AS orders
         |FROM r
         |WHERE window_start_ms > (SELECT max(window_start_ms) FROM r) - 7*24*3600*1000
         |GROUP BY hour_of_day
         |ORDER BY hour_of_day""".stripMargin,
  )
}
