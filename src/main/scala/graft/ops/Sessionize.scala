package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization via Spark's native `session_window` —
  * the same operator works in batch AND Structured Streaming (with a
  * watermark), which is exactly the Spark-first answer to "sessions":
  * declare the window, let the planner pick the merging aggregation.
  *
  * Semantics (shared by both modes and the DuckDB oracle): events of
  * one key belong to one session while consecutive gaps are <= `gap`
  * (Spark merges an event landing exactly on the previous window's
  * end); only a gap STRICTLY greater than `gap` starts a new
  * session. `session_end` is last-event-ts + gap (window.end).
  *
  * Scale: one shuffle on the session-window merge key — identical
  * plan shape to any keyed aggregation; no per-key state beyond the
  * open sessions in streaming mode.
  */
object Sessionize {

  /** Sessions per `keyCol` with inactivity gap `gap` (e.g.
    * "30 minutes"): start/end (epoch ms), event count, value sum.
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, valueCol: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value_cents"))
      .select(
        col(keyCol),
        unix_millis(col("sw.start")).as("session_start_ms"),
        unix_millis(col("sw.end")).as("session_end_ms"),
        col("n_events"),
        col("sum_value_cents"))
}
