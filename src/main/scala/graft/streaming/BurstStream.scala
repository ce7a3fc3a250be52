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
  * no gap-only state can decide for events still inside the
  * admissible-lateness window: the neighbors of a late insert are
  * needed.
  *
  * State at scale — the watermark-horizon fold: only errors within
  * `horizonUs` of the key's max seen event time can still be split
  * by an admissible late arrival (the pipeline's W2 lateness
  * contract; the reference drops beyond-watermark events too,
  * TopKStreamingJob.kt:248-249). Older errors are SETTLED into a
  * running qualifying-pair count + earliest-burst instant — O(1) —
  * plus the single boundary error that splices the settled region
  * onto the live tail; only the within-horizon tail stays a raw
  * (tu, event_id) list, deduped by event_id (replay-idempotent: a
  * replayed settled error sorts at-or-before the boundary and is
  * dropped like a beyond-horizon arrival). A key emits only when its
  * stats change — so replays emit nothing and folding
  * last-emission-per-user equals the batch operator under ANY
  * in-contract arrival order. Optional `idleTtl` evicts keys idle
  * past the duration (processing-time timer — the
  * [[PerElementTopK]] guarantee).
  */
object BurstStream {

  case class ErrEv(tu: Long, id: Long)

  /** Bounded per-key state: settled qualifying-pair count + first
    * settled burst instant (Long.MaxValue = none), the last settled
    * error as splice boundary + late-drop bound, the within-horizon
    * tail, and the last-emitted stats for change-only emission.
    */
  case class ErrSt(settledN: Long, settledFirstUs: Long,
      boundary: Option[ErrEv], tail: Seq[ErrEv], maxTu: Long,
      nBursts: Long, firstUs: Long)

  case class Burst(user_id: Long, n_bursts: Long, first_burst_us: Long)

  /** 24-hour burst span, in microseconds. */
  val spanUs: Long = 86400L * 1000000L

  val emptySt: ErrSt = ErrSt(0L, Long.MaxValue, None, Vector.empty,
    Long.MinValue, 0L, Long.MaxValue)

  private def afterErr(e: ErrEv, b: ErrEv): Boolean =
    e.tu > b.tu || (e.tu == b.tu && e.id > b.id)

  /** Pure state transition — same admit/settle contract as
    * [[TypeHistoryStream.step]]; settling error e adds a qualifying
    * pair when it follows the boundary within the span, and advances
    * the boundary.
    */
  private[graft] def step(st: ErrSt, fresh0: Seq[ErrEv],
      horizonUs: Long): ErrSt = {
    val seen = st.tail.iterator.map(_.id).toSet
    val fresh = fresh0.distinctBy(_.id)
      .filterNot(e => seen.contains(e.id))
      .filter(e => st.boundary.forall(b => afterErr(e, b)))
    val merged = (st.tail ++ fresh).sortBy(e => (e.tu, e.id))
    val maxTu = if (merged.isEmpty) st.maxTu
      else math.max(st.maxTu, merged.last.tu)
    val threshold =
      if (maxTu == Long.MinValue) Long.MinValue else maxTu - horizonUs
    val (toSettle, keep) = merged.span(_.tu <= threshold)
    var n = st.settledN
    var first = st.settledFirstUs
    var boundary = st.boundary
    toSettle.foreach { e =>
      boundary.foreach { b =>
        if (e.tu - b.tu <= spanUs) { n += 1L; first = math.min(first, e.tu) }
      }
      boundary = Some(e)
    }
    st.copy(settledN = n, settledFirstUs = first, boundary = boundary,
      tail = keep, maxTu = maxTu)
  }

  /** The key's complete current stats from bounded state: settled
    * count/first plus the (boundary ++ tail) live pairs.
    */
  private[graft] def statsFromState(st: ErrSt): (Long, Long) = {
    val live = st.boundary.toSeq ++ st.tail
    val qualifying = live.zip(live.drop(1))
      .filter { case (a, b) => b.tu - a.tu <= spanUs }
      .map(_._2.tu)
    val n = st.settledN + qualifying.size.toLong
    val first = (st.settledFirstUs +: qualifying).min
    (n, first)
  }

  private def update(horizonUs: Long, idleTtl: Option[java.time.Duration])(
      key: Long, it: Iterator[TypeHistoryStream.Ev],
      state: GroupState[ErrSt]): Iterator[Burst] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = it.toSeq
      // GDPR tombstone ([[StreamErase]]): drop the key's state and
      // emit the zero-burst delete marker (n_bursts = 0, sentinel
      // first instant) — update-mode folds treat it as removal,
      // matching the batch operator's burst-users-only output
      if (StreamErase.requested(evs.iterator.map(_.event_type))) {
        state.remove()
        Iterator.single(Burst(key, 0L, Long.MaxValue))
      } else {
        val prev = state.getOption.getOrElse(emptySt)
        val fresh = evs.iterator
          .filter(_.event_type == "error")
          .map(e => ErrEv(
            e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L,
            e.event_id)).toSeq
        if (fresh.isEmpty && !state.exists) Iterator.empty
        else {
          val stepped = step(prev, fresh, horizonUs)
          val (n, first) = statsFromState(stepped)
          state.update(stepped.copy(nBursts = n, firstUs = first))
          idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
          if (n == prev.nBursts && first == prev.firstUs) Iterator.empty
          else if (n == 0) Iterator.empty // not yet a burst user
          else Iterator.single(Burst(key, n, first))
        }
      }
    }
  }

  /** Update-mode per-user burst stats from an events stream (full
    * schema; non-error rows are ignored key-locally). `horizonUs` is
    * the admissible event-time lateness; `idleTtl` (processing-time)
    * evicts keys idle past the duration.
    */
  def bursts(spark: SparkSession, events: DataFrame,
      horizonUs: Long = TypeHistoryStream.defaultHorizonUs,
      idleTtl: Option[java.time.Duration] = None): Dataset[Burst] = {
    import spark.implicits._
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value_cents"))
      .as[TypeHistoryStream.Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        timeout)(update(horizonUs, idleTtl))
  }
}
