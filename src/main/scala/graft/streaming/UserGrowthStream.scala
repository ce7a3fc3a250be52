package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the cumulative user-growth curve
  * ([[graft.queries.OlapQueries.userGrowth]]) — the DAU/new-user
  * pipeline shape: per-user state is the MINIMUM first-seen day
  * (min-merge, so out-of-order and replayed events across any batch
  * split converge to the batch answer — the
  * [[StreamingFunnel]] order-insensitivity discipline), and a key
  * emits its (user, first_day) row only when the minimum CHANGES.
  * Folding the emitted updates (last write per user wins) yields
  * exactly the batch first-seen-day table; per-day counts and the
  * running total derive downstream.
  *
  * State at scale: one long per user ever seen — the same bound as
  * the batch reduction's group count, and the growth question cannot
  * be answered with less (a user's novelty is global history).
  */
object UserGrowthStream {

  case class Seen(user_id: Long, ts: Timestamp)
  case class FirstSeen(user_id: Long, first_day: Long)

  private val dayMs = 86400000L

  private def update(key: Long, it: Iterator[Seen],
      state: GroupState[Long]): Iterator[FirstSeen] = {
    val incoming = it.map(_.ts.getTime / dayMs).min
    val cur = state.getOption
    if (cur.forall(incoming < _)) {
      state.update(incoming)
      Iterator.single(FirstSeen(key, incoming))
    } else Iterator.empty
  }

  /** Update-mode (user, first_day) emissions — a row per key per
    * batch in which its first-seen day improved.
    */
  def firstSeen(spark: SparkSession, events: DataFrame): Dataset[FirstSeen] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts")).as[Seen]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
