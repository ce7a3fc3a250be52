package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the SCD2 change history
  * ([[graft.queries.OlapQueries.typeHistory]]): per user, the
  * validity interval of each event-TYPE run, maintained as an
  * update-mode stream. A late (out-of-order) event can SPLIT an
  * existing run or merge two — `"a@1 a@9" + late b@5` must become
  * `a@[1,5) b@[5,9) a@[9,∞)` — so no change-point-only state can be
  * correct for events still inside the admissible-lateness window:
  * deciding a late insert needs the type of the NEXT raw event,
  * which is generally not a change point.
  *
  * State at scale — the watermark-horizon fold: only events within
  * `horizonUs` of the key's max seen event time can still be split
  * by an admissible late arrival (the same lateness contract as the
  * pipeline's W2 watermark; the reference drops beyond-watermark
  * events too, TopKStreamingJob.kt:248-249). Events older than that
  * are SETTLED: compacted to their change points (one entry per
  * run — the operator's own output floor, since every emission
  * carries the full history) plus the single boundary event that
  * splices the settled region onto the live tail. Only the
  * within-horizon tail is kept as a raw (tu, event_id, type) list,
  * deduped by event_id (replay-idempotent: a replayed settled event
  * sorts at-or-before the boundary and is dropped by the same rule
  * as a beyond-horizon late arrival). Optional `idleTtl` evicts
  * whole keys idle past the duration (processing-time timer — the
  * [[PerElementTopK]] guarantee), so total state is
  * O(active keys × (runs + horizon-tail)).
  *
  * The reference's upsert-table analog keeps the same per-key
  * history to serve "state at time T"
  * (orders_raw_upsert_table.json's full-row upsert mode); every
  * Flink state there carries a TTL (TopKStreamingJob.kt:87-103).
  */
object TypeHistoryStream {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value_cents: Long)

  case class TypeRun(event_type: String, valid_from_ms: Long,
      valid_to_ms: Option[Long])

  /** One user's complete current history (update-mode emission —
    * replaces any earlier emission for the key).
    */
  case class History(user_id: Long, runs: Seq[TypeRun])

  /** (tu micros, event_id, type) — the batch operator's total order. */
  case class StEv(tu: Long, id: Long, typ: String)

  /** A settled change point: the first event of a settled run. */
  case class Change(tu: Long, typ: String)

  /** Bounded per-key state: settled change points (one per run),
    * the last settled event as splice boundary + late-drop bound,
    * and the raw within-horizon tail (sorted by (tu, id)).
    */
  case class St(changes: Seq[Change], boundary: Option[StEv],
      tail: Seq[StEv], maxTu: Long)

  val emptySt: St = St(Vector.empty, None, Vector.empty, Long.MinValue)

  /** Admissible-lateness horizon default: 90 days. An event later
    * than this (vs the key's max seen event time) is out-of-contract
    * and dropped, exactly like a beyond-watermark row (W4).
    */
  val defaultHorizonUs: Long = 90L * 86400L * 1000000L

  private[graft] def after(e: StEv, b: StEv): Boolean =
    e.tu > b.tu || (e.tu == b.tu && e.id > b.id)

  /** Pure state transition: admit `fresh`, settle everything older
    * than `maxTu − horizonUs` into change points, keep the rest as
    * the tail. Total-order and output semantics identical to folding
    * the full event list (the pre-horizon implementation) for every
    * in-contract arrival sequence.
    */
  private[graft] def step(st: St, fresh0: Seq[StEv], horizonUs: Long): St = {
    val seen = st.tail.iterator.map(_.id).toSet
    val fresh = fresh0.distinctBy(_.id)
      .filterNot(e => seen.contains(e.id))
      .filter(e => st.boundary.forall(b => after(e, b)))
    val merged = (st.tail ++ fresh).sortBy(e => (e.tu, e.id))
    val maxTu = if (merged.isEmpty) st.maxTu
      else math.max(st.maxTu, merged.last.tu)
    val threshold =
      if (maxTu == Long.MinValue) Long.MinValue else maxTu - horizonUs
    val (toSettle, keep) = merged.span(_.tu <= threshold)
    var changes = st.changes
    var boundary = st.boundary
    toSettle.foreach { e =>
      if (changes.lastOption.forall(_.typ != e.typ))
        changes = changes :+ Change(e.tu, e.typ)
      boundary = Some(e)
    }
    St(changes, boundary, keep, maxTu)
  }

  /** The key's complete current history from bounded state: settled
    * change points spliced with the tail's change points.
    */
  private[graft] def runsFromState(st: St): Seq[TypeRun] = {
    var changes = st.changes.toVector
    var lastTyp = st.boundary.map(_.typ)
    st.tail.foreach { e =>
      if (!lastTyp.contains(e.typ)) changes = changes :+ Change(e.tu, e.typ)
      lastTyp = Some(e.typ)
    }
    changes.zipWithIndex.map { case (c, i) =>
      TypeRun(c.typ, c.tu / 1000L, changes.lift(i + 1).map(_.tu / 1000L))
    }
  }

  private[graft] def toStEv(e: Ev): StEv = StEv(
    e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L,
    e.event_id, e.event_type)

  private def update(horizonUs: Long, idleTtl: Option[java.time.Duration])(
      key: Long, it: Iterator[Ev],
      state: GroupState[St]): Iterator[History] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = it.toSeq
      // GDPR tombstone ([[StreamErase]]): drop the key's state and
      // emit a cleared history (erase-wins within the batch)
      if (StreamErase.requested(evs.iterator.map(_.event_type))) {
        state.remove()
        Iterator.single(History(key, Seq.empty))
      } else {
        val next = step(state.getOption.getOrElse(emptySt),
          evs.map(toStEv), horizonUs)
        state.update(next)
        idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
        Iterator.single(History(key, runsFromState(next)))
      }
    }
  }

  /** Update-mode per-user histories from an events stream.
    * `horizonUs` is the admissible event-time lateness (state keeps
    * raw events only within it); `idleTtl` (processing-time) evicts
    * keys idle past the duration.
    */
  def histories(spark: SparkSession, events: DataFrame,
      horizonUs: Long = defaultHorizonUs,
      idleTtl: Option[java.time.Duration] = None): Dataset[History] = {
    import spark.implicits._
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value_cents"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(
        update(horizonUs, idleTtl))
  }
}
