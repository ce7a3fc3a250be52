package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D2: event-time-timer dedup — the reference's timer-cleanup variant
  * (ProcessFunctions.kt:21-57). The first event per key is emitted
  * and the key's state registers an event-time timer at ts + ttl;
  * when the watermark passes the timer, the state is cleared and the
  * key may fire again.
  *
  * This differs from `dropDuplicatesWithinWatermark` (D1) in that the
  * suppression horizon is an explicit per-key TTL, decoupled from the
  * watermark delay — the semantics a business rule like "one order
  * event per id per hour" needs, vs D1's "drop replays within
  * out-of-orderness slack".
  *
  * State at scale: one (key → firstSeenMs) entry per live key,
  * evicted by its own timer — bounded by keys-per-TTL-window exactly
  * like the Flink original.
  */
object TimerDedup {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value_cents: Long)

  def update(ttlMs: Long)(
      key: Long,
      it: Iterator[Ev],
      state: GroupState[Long]): Iterator[Ev] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = it.toSeq
      // a key can receive data in the same batch its timer would have
      // fired — the timeout callback never runs for groups WITH data,
      // so expiry must also be checked explicitly against the watermark.
      val live = state.getOption.exists(_ + ttlMs > state.getCurrentWatermarkMs())
      if (evs.isEmpty || live) Iterator.empty // replay within TTL
      else {
        val first = evs.minBy(e => (e.ts.getTime, e.user_id))
        state.update(first.ts.getTime)
        // timer must not be behind the watermark Spark already holds
        state.setTimeoutTimestamp(
          math.max(first.ts.getTime + ttlMs, state.getCurrentWatermarkMs() + 1))
        Iterator.single(first)
      }
    }
  }

  /** `events` must already carry a watermark on `ts`. */
  def dedup(spark: SparkSession, events: Dataset[Ev], ttlMs: Long): Dataset[Ev] = {
    import spark.implicits._
    events
      .groupByKey(_.event_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        update(ttlMs))
  }
}
