package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the CEP-style burst detector
  * ([[graft.queries.AnalyticsQueries.errorBurstsOf]] — the
  * Flink-CEP class the reference's stack is known for): per user,
  * the count of CONSECUTIVE error pairs within 24 h plus the first
  * burst instant, maintained as an update-mode stream. Consecutive
  * means adjacent in the user's full time-sorted error sequence, so
  * a LATE error splits an existing pair into two (both qualifying if
  * the original did — n_bursts grows) — which, like the SCD2 twin,
  * no gap-only state can decide: the neighbors of a late insert are
  * needed. State is the user's deduped (tu, event_id) error list
  * (the batch window's per-group bound held per key; bound it in a
  * real deployment by evicting beyond the burst horizon), pairs are
  * re-derived per update, and a key emits only when its stats
  * change — so replays emit nothing and folding
  * last-emission-per-user equals the batch operator under ANY
  * arrival order.
  */
object BurstStream {

  case class ErrEv(tu: Long, id: Long)

  case class ErrSt(events: Seq[ErrEv], nBursts: Long, firstUs: Long)

  case class Burst(user_id: Long, n_bursts: Long, first_burst_us: Long)

  /** 24-hour burst span, in microseconds. */
  val spanUs: Long = 86400L * 1000000L

  private[graft] def statsOf(events: Seq[ErrEv]): (Long, Long) = {
    val sorted = events.sortBy(e => (e.tu, e.id))
    val qualifying = sorted.iterator.zip(sorted.iterator.drop(1))
      .filter { case (a, b) => b.tu - a.tu <= spanUs }
      .map(_._2.tu).toSeq
    (qualifying.size.toLong, if (qualifying.isEmpty) Long.MaxValue else qualifying.min)
  }

  private def update(key: Long, it: Iterator[TypeHistoryStream.Ev],
      state: GroupState[ErrSt]): Iterator[Burst] = {
    val prev = state.getOption.getOrElse(ErrSt(Seq.empty, 0L, Long.MaxValue))
    val seen = prev.events.map(_.id).toSet
    val fresh = it
      .filter(_.event_type == "error")
      .map(e => ErrEv(
        e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L, e.event_id))
      .filterNot(e => seen.contains(e.id)).toSeq
      .distinctBy(_.id)
    if (fresh.isEmpty) Iterator.empty
    else {
      val merged = prev.events ++ fresh
      val (n, first) = statsOf(merged)
      state.update(ErrSt(merged, n, first))
      if (n == prev.nBursts && first == prev.firstUs) Iterator.empty
      else if (n == 0) Iterator.empty // not yet a burst user
      else Iterator.single(Burst(key, n, first))
    }
  }

  /** Update-mode per-user burst stats from an events stream (full
    * schema; non-error rows are ignored key-locally).
    */
  def bursts(spark: SparkSession, events: DataFrame): Dataset[Burst] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value_cents"))
      .as[TypeHistoryStream.Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
