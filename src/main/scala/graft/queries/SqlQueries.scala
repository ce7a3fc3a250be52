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
    // hour_of_day / day_of_week_iso are carried in the rollup output
    // itself (orders_1m_rollup_schema.json's hour/day dims).
    Rollup.rollup1mHll(Tables.events(spark, dir))
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
    * DISTINCTCOUNTHLL re-merge of the stored sketches. The estimate
    * is checked in-tolerance against the exact distinct recomputed
    * from the raw table over the same window filter (`est_ok`, the
    * constant-1 predicate the oracle also asserts); sums/counts/exact
    * distinct hash-check directly.
    */
  def topkRollup(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql("""
      WITH agg AS (
        SELECT event_type,
          SUM(sum_value_cents) AS total_revenue_cents,
          SUM(order_count) AS total_orders,
          hll_sketch_estimate(hll_union_agg(users_hll)) AS uc_est
        FROM orders_1m_rollup
        WHERE window_start_ms > (SELECT max(window_start_ms) FROM orders_1m_rollup) - 24*3600*1000
        GROUP BY event_type),
      w AS (
        SELECT event_type, user_id, unix_millis(date_trunc('MINUTE', ts)) AS wsm
        FROM orders_raw),
      exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS unique_customers
        FROM w
        WHERE wsm > (SELECT max(wsm) FROM w) - 24*3600*1000
        GROUP BY event_type)
      SELECT a.event_type, total_revenue_cents, total_orders, unique_customers,
        CASE WHEN 20 * abs(CAST(uc_est AS BIGINT) - unique_customers)
                  <= greatest(40L, unique_customers)
             THEN 1L ELSE 0L END AS est_ok
      FROM agg a JOIN exact e ON a.event_type = e.event_type
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

  /** Sessionization straight from SQL — `session_window` is a plain
    * SQL grouping expression in Spark, so the temporal operator is
    * reachable from the reference's SQL-first workflow too (same
    * semantics and oracle as TemporalQueries.sessionize).
    */
  def sessionizeSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql("""
      SELECT user_id,
        unix_millis(session_window.start) AS session_start_ms,
        unix_millis(session_window.end) AS session_end_ms,
        COUNT(*) AS n_events,
        SUM(value_cents) AS sum_value_cents
      FROM orders_raw
      GROUP BY session_window(ts, '30 minutes'), user_id""")
  }

  /** The injected scalar text family, driven PURE-SQL end-to-end:
    * [[graft.plans.GraftExtensions.registerTextFunctions]] registers
    * `graft_*` on the live session (the driver owns session
    * construction, so the `spark.sql.extensions` config path is out
    * of reach in the gate), then one SQL statement uses normalize /
    * token-count / fingerprint / hash-bucket / lang-id together.
    * Hash-checked against DuckDB recomputing every function from its
    * documented definition — proving the SQL spelling is semantics-
    * identical to the Column API, not just resolvable.
    */
  def textFunctionsSql(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.registerTextFunctions(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql("""
      SELECT doc_id,
        graft_normalize(text) AS norm_text,
        graft_token_count(text) AS n_tokens,
        graft_fingerprint(text) AS fp,
        graft_hash_bucket(doc_id, 100) AS bucket,
        graft_lang_id(text) AS lang_pred
      FROM documents""")
  }

  val queries: Map[String, QFn] = Map(
    "q_sql_topk_raw" -> (topkRaw _),
    "q_sql_topk_rollup" -> (topkRollup _),
    "q_sql_revenue_by_hour" -> (revenueByHour _),
    "q_sql_sessionize" -> (sessionizeSql _),
    "q_sql_text_functions" -> (textFunctionsSql _),
  )

  private val cents = "CAST(round(value*100) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    // each graft_* SQL function recomputed from its documented
    // definition (same snippets as the per-function doc oracles)
    "q_sql_text_functions" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS norm_text,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  md5(text) AS fp,
        |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
        |  CASE WHEN greatest(
        |         len(list_filter(toks, x -> list_contains(['the','a','fast','slow'], x))),
        |         len(list_filter(toks, x -> list_contains(['data','table','row','column'], x))),
        |         len(list_filter(toks, x -> list_contains(['stream','batch','window','group'], x))),
        |         len(list_filter(toks, x -> list_contains(['query','join','filter','sort'], x)))) = 0 THEN 'und'
        |       WHEN len(list_filter(toks, x -> list_contains(['the','a','fast','slow'], x))) = greatest(
        |         len(list_filter(toks, x -> list_contains(['the','a','fast','slow'], x))),
        |         len(list_filter(toks, x -> list_contains(['data','table','row','column'], x))),
        |         len(list_filter(toks, x -> list_contains(['stream','batch','window','group'], x))),
        |         len(list_filter(toks, x -> list_contains(['query','join','filter','sort'], x)))) THEN 'en'
        |       WHEN len(list_filter(toks, x -> list_contains(['data','table','row','column'], x))) = greatest(
        |         len(list_filter(toks, x -> list_contains(['the','a','fast','slow'], x))),
        |         len(list_filter(toks, x -> list_contains(['data','table','row','column'], x))),
        |         len(list_filter(toks, x -> list_contains(['stream','batch','window','group'], x))),
        |         len(list_filter(toks, x -> list_contains(['query','join','filter','sort'], x)))) THEN 'es'
        |       WHEN len(list_filter(toks, x -> list_contains(['stream','batch','window','group'], x))) = greatest(
        |         len(list_filter(toks, x -> list_contains(['the','a','fast','slow'], x))),
        |         len(list_filter(toks, x -> list_contains(['data','table','row','column'], x))),
        |         len(list_filter(toks, x -> list_contains(['stream','batch','window','group'], x))),
        |         len(list_filter(toks, x -> list_contains(['query','join','filter','sort'], x)))) THEN 'de'
        |       ELSE 'fr' END AS lang_pred
        |FROM t""".stripMargin,
    // identical surface/semantics to q_sessionize (strictly-greater
    // gap starts a session; end = last ts + gap at µs grain).
    "q_sql_sessionize" ->
      s"""WITH m AS (
         |  SELECT user_id, epoch_us(ts) AS tu, $cents AS c,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS ns
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
         |s AS (
         |  SELECT user_id, tu, c,
         |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tu
         |                  ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM m)
         |SELECT user_id,
         |  CAST(min(tu) // 1000 AS BIGINT) AS session_start_ms,
         |  CAST(max(tu) // 1000 + 1800000 AS BIGINT) AS session_end_ms,
         |  count(*) AS n_events,
         |  CAST(SUM(c) AS BIGINT) AS sum_value_cents
         |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_sql_topk_rollup" ->
      s"""WITH w AS (SELECT event_type, user_id, $cents AS vc,
         |    epoch_ms(date_trunc('minute', ts)) AS wsm FROM events),
         |f AS (SELECT * FROM w WHERE wsm > (SELECT max(wsm) FROM w) - 24*3600*1000)
         |SELECT event_type,
         |  CAST(SUM(vc) AS BIGINT) AS total_revenue_cents,
         |  COUNT(*) AS total_orders,
         |  COUNT(DISTINCT user_id) AS unique_customers,
         |  1::BIGINT AS est_ok
         |FROM f GROUP BY event_type
         |ORDER BY total_revenue_cents DESC, event_type ASC
         |LIMIT 10""".stripMargin,
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
