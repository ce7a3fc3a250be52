package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the SCD2 change history
  * ([[graft.queries.OlapQueries.typeHistory]]): per user, the
  * validity interval of each event-TYPE run, maintained as an
  * update-mode stream. A late (out-of-order) event can SPLIT an
  * existing run or merge two — `"a@1 a@9" + late b@5` must become
  * `a@[1,5) b@[5,9) a@[9,∞)` — so no change-point-only state can be
  * correct: deciding a late insert needs the type of the NEXT raw
  * event, which is generally not a change point. State is therefore
  * the user's (tu, event_id, type) event list, deduped by event_id
  * (replay-idempotent by construction) and re-run into intervals on
  * every update; each update emits the user's COMPLETE current
  * history, so folding last-emission-per-user equals the batch
  * operator under ANY batch split and ANY arrival order.
  *
  * State at scale: per-user event list — exactly the per-group bound
  * of the batch operator's user-keyed window sort, held per key
  * instead of per partition; recompute is key-local (no shuffle
  * beyond the groupByKey exchange). The reference's upsert-table
  * analog keeps the same per-key history to serve "state at time T"
  * (orders_raw_upsert_table.json's full-row upsert mode).
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

  case class St(events: Seq[StEv])

  private[graft] def runsOf(events: Seq[StEv]): Seq[TypeRun] = {
    val sorted = events.sortBy(e => (e.tu, e.id))
    val changes = sorted.foldLeft(Vector.empty[(Long, String)]) {
      case (acc, e) =>
        if (acc.lastOption.forall(_._2 != e.typ)) acc :+ ((e.tu, e.typ)) else acc
    }
    changes.zipWithIndex.map { case ((tu, typ), i) =>
      TypeRun(typ, tu / 1000L,
        changes.lift(i + 1).map(_._1 / 1000L))
    }
  }

  private def update(key: Long, it: Iterator[Ev],
      state: GroupState[St]): History = {
    val prev = state.getOption.map(_.events).getOrElse(Seq.empty)
    val seen = prev.map(_.id).toSet
    // micros, not getTime's millis: the batch operator orders on
    // unix_micros(ts), and sub-ms timestamps must tie-break equally
    val fresh = it.map(e => StEv(
        e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L,
        e.event_id, e.event_type))
      .filterNot(e => seen.contains(e.id)).toSeq
      .distinctBy(_.id) // replay/dup guard inside the batch too
    val merged = prev ++ fresh
    state.update(St(merged))
    History(key, runsOf(merged))
  }

  /** Update-mode per-user histories from an events stream. */
  def histories(spark: SparkSession, events: DataFrame): Dataset[History] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value_cents"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}
