package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming absence detection — the timer pattern the batch
  * gap-fill query ([[graft.queries.OlapQueries.gapfillMinutes]])
  * can't express: alert WHILE a key is silent, not after the data
  * shows up again. Per key:
  *
  *  - "closed" alert: an arriving event sits more than `gapMs` after
  *    the key's previous event — emitted data-driven with exact
  *    bounds, INCLUDING gaps wholly inside one batch, so the closed
  *    alert set is invariant to how the stream is split into batches
  *    and equals the batch lag-pair recompute (the StreamingFunnel
  *    parity discipline);
  *  - "open" alert: the event-time timer fires when the watermark
  *    passes lastSeen + gapMs with no new data — the monitoring
  *    signal. One open alert per silence episode (the timer is not
  *    re-armed until data returns); when data does return, the
  *    episode still produces its closed alert with final bounds.
  *
  * State at scale: one (lastSeenMs, alerted) pair per key, bounded by
  * an idle-TTL sweep (the [[PerElementTopK]] policy, spelled with this
  * operator's own event-time timers): once a key's open alert has
  * fired and the key stays silent another `idleTtlMs`, its state is
  * removed — so dead per-entity keys cost state for gapMs + idleTtlMs
  * after their last event, not forever. A key returning AFTER the
  * sweep restarts fresh: its episode's eventual closed alert is
  * forfeited (the bounds were swept — the open alert already reported
  * the outage), and no spurious open fires on return.
  */
object GapAlert {

  case class Ev(ts: Timestamp, key: String)

  /** gap_end_ms / gap_ms are -1 on open alerts (the gap has no end
    * yet — its eventual extent arrives with the closed alert).
    */
  case class Alert(key: String, kind: String, gap_start_ms: Long,
      gap_end_ms: Long, gap_ms: Long)

  /** public: the state encoder's generated code must reach the
    * constructor
    */
  case class KeyState(lastSeenMs: Long, alerted: Boolean)

  private def update(gapMs: Long, idleTtlMs: Long)(
      key: String,
      it: Iterator[Ev],
      state: GroupState[KeyState]): Iterator[Alert] = {
    if (state.hasTimedOut) {
      val s = state.get
      if (s.alerted) {
        // idle-TTL sweep: the open alert fired idleTtlMs ago and the
        // key is still silent — evict. No output; a later return
        // starts a fresh episode.
        state.remove()
        Iterator.empty
      } else {
        state.update(KeyState(s.lastSeenMs, alerted = true))
        // evict idleTtlMs after the OPEN ALERT (lastSeen + gapMs),
        // not after lastSeen — an idleTtlMs <= gapMs would otherwise
        // make this timer already due and sweep the key on the next
        // watermark tick, unconditionally forfeiting the episode's
        // closed alert (contract: gapMs + idleTtlMs of silence)
        state.setTimeoutTimestamp(
          math.max(s.lastSeenMs + gapMs + idleTtlMs,
            state.getCurrentWatermarkMs() + 1))
        Iterator.single(Alert(key, "open", s.lastSeenMs, -1L, -1L))
      }
    } else {
      val times = it.map(_.ts.getTime).toArray.sorted
      val prev = state.getOption
      // events at or before the stored lastSeen are late arrivals
      // inside the watermark slack: they can't extend the chain, and
      // retracting an already-emitted alert is impossible in append
      // mode, so they are ignored (the watermark bounds how much this
      // can under-report a gap)
      val fresh = prev.fold(times)(p => times.filter(_ > p.lastSeenMs))
      if (fresh.isEmpty) {
        // timers are cleared on every invocation — re-arm the pending
        // one (open-alert timer before the alert, eviction timer
        // after) or it is silently lost
        prev.foreach { p =>
          val at =
            if (p.alerted) p.lastSeenMs + gapMs + idleTtlMs
            else p.lastSeenMs + gapMs
          state.setTimeoutTimestamp(
            math.max(at, state.getCurrentWatermarkMs() + 1))
        }
        Iterator.empty
      } else {
        // predecessor chain: stored lastSeen, then this batch's events
        // in event-time order — every adjacent pair over the gap is a
        // closed alert, so batch splits can't move or merge alerts
        val chain = prev.map(_.lastSeenMs).toArray ++ fresh
        val closed = chain.sliding(2).collect {
          case Array(a, b) if b - a > gapMs => Alert(key, "closed", a, b, b - a)
        }.toSeq
        val last = chain.last
        state.update(KeyState(last, alerted = false))
        // timer must not be behind the watermark Spark already holds
        state.setTimeoutTimestamp(
          math.max(last + gapMs, state.getCurrentWatermarkMs() + 1))
        closed.iterator
      }
    }
  }

  /** `events` must already carry a watermark on `ts`. `idleTtlMs`
    * (default 10 gaps) bounds per-key state: silence past
    * gapMs + idleTtlMs evicts the key — size it to the longest outage
    * whose closed-alert bounds are still worth reporting on recovery.
    */
  def alerts(spark: SparkSession, events: Dataset[Ev], gapMs: Long,
      idleTtlMs: Long = -1L): Dataset[Alert] = {
    import spark.implicits._
    val ttl = if (idleTtlMs > 0) idleTtlMs else 10 * gapMs
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        update(gapMs, ttl))
  }
}
