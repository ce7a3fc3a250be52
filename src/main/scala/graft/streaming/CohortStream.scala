package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the cohort-retention curve
  * ([[graft.queries.AnalyticsQueries.cohortRetention]]): per-user
  * state is the SET of active days — bounded by the user's distinct
  * active days, the same per-group bound as the batch window — and a
  * key emits its (cohort_day, day-offset list) only when the set
  * grows. A late event can change the user's cohort day (a new
  * minimum), which SHIFTS every offset; re-deriving the offsets from
  * the full day set on each update makes the emission correct under
  * ANY arrival order, so folding last-emission-per-user and counting
  * users per (cohort, offset) equals the batch curve exactly
  * (the [[UserGrowthStream]] min-merge discipline, carried to the
  * whole retention profile).
  */
object CohortStream {

  case class Seen(user_id: Long, ts: Timestamp, event_type: String)

  /** One user's complete current retention profile (update-mode:
    * replaces earlier emissions for the key). An EMPTY `offsets`
    * list is the cleared/delete emission ([[StreamErase]]) — it
    * contributes no (cohort, offset) rows to any fold.
    */
  case class UserCohort(user_id: Long, cohort_day: Long, offsets: Seq[Long])

  // top-level public: Janino can't compile the state encoder's
  // generated code against a private case class (see TypeHistoryStream)
  case class Days(days: Seq[Long])

  private val dayMs = 86400000L

  private def update(key: Long, it: Iterator[Seen],
      state: GroupState[Days]): Iterator[UserCohort] = {
    val evs = it.toSeq
    // GDPR tombstone ([[StreamErase]]): drop the key's state and
    // emit the cleared profile (erase-wins within the batch)
    if (StreamErase.requested(evs.iterator.map(_.event_type))) {
      state.remove()
      Iterator.single(UserCohort(key, 0L, Seq.empty))
    } else {
      val prev = state.getOption.map(_.days.toSet).getOrElse(Set.empty[Long])
      val merged = prev ++ evs.iterator.map(_.ts.getTime / dayMs)
      if (state.exists && merged.size == prev.size) Iterator.empty
      else {
        val sorted = merged.toSeq.sorted
        state.update(Days(sorted))
        val cohort = sorted.head
        Iterator.single(UserCohort(key, cohort, sorted.map(_ - cohort)))
      }
    }
  }

  /** Update-mode per-user retention profiles from an events stream. */
  def cohorts(spark: SparkSession, events: DataFrame): Dataset[UserCohort] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_type")).as[Seen]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
