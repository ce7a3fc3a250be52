package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.queries.AnalyticsQueries.funnelOf]]:
  * per-user first-touch funnel staging maintained continuously.
  *
  * State per user is FOUR microsecond timestamps (the first signup /
  * view / click / purchase seen) — constant-size, order-insensitive
  * (min-merge), so late or out-of-order events can only refine the
  * state toward the batch answer: replaying the full stream in any
  * batch split yields exactly the batch funnel (asserted in
  * StreamingSpec). Same state-TTL contract as
  * [[ContinuousTopK.rank]]: `idleTtlMs` evicts idle users once the
  * watermark passes; None keeps state forever (bounded-cardinality
  * use only).
  */
object StreamingFunnel {

  /** One first-touch per stage; MaxValue = not seen. */
  case class FirstTouch(s: Long, v: Long, c: Long, p: Long)

  case class Touch(user_id: Long, event_type: String, tu: Long,
      ts: java.sql.Timestamp)

  case class UserStage(user_id: Long, max_stage: Long)

  val none: Long = Long.MaxValue

  /** Strict-order staging, identical to the batch op: a stage counts
    * only if every earlier first-touch strictly precedes it. Both
    * sides must be PRESENT — `s < absent-sentinel` must not count
    * (the batch twin's NULL comparison is false).
    */
  def stageOf(t: FirstTouch): Long = {
    def lt(a: Long, b: Long) = a != none && b != none && a < b
    var stage = 0L
    if (t.s != none) stage += 1
    if (lt(t.s, t.v)) stage += 1
    if (lt(t.s, t.v) && lt(t.v, t.c)) stage += 1
    if (lt(t.s, t.v) && lt(t.v, t.c) && lt(t.c, t.p)) stage += 1
    stage
  }

  private def merge(prev: FirstTouch, evs: Seq[Touch]): FirstTouch =
    evs.foldLeft(prev) { (st, e) =>
      e.event_type match {
        case "signup" => st.copy(s = math.min(st.s, e.tu))
        case "view" => st.copy(v = math.min(st.v, e.tu))
        case "click" => st.copy(c = math.min(st.c, e.tu))
        case "purchase" => st.copy(p = math.min(st.p, e.tu))
        case _ => st
      }
    }

  private def updateUser(idleTtlMs: Option[Long])(
      uid: Long, updates: Iterator[Touch],
      state: GroupState[FirstTouch]): Iterator[UserStage] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = updates.toSeq
      val st = merge(state.getOption.getOrElse(FirstTouch(none, none, none, none)), evs)
      state.update(st)
      idleTtlMs.foreach { ttl =>
        val maxTs = evs.iterator.map(_.ts.getTime) ++
          Iterator.single(state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(
          math.max(maxTs.max + ttl, state.getCurrentWatermarkMs() + 1))
      }
      Iterator.single(UserStage(uid, stageOf(st)))
    }
  }

  /** Continuous per-user stage updates from a streaming events frame
    * (user_id, event_type, ts). Each micro-batch emits the refreshed
    * stage for every touched user.
    */
  def stageUpdates(spark: SparkSession, events: DataFrame,
      idleTtlMs: Option[Long] = None): Dataset[UserStage] = {
    import spark.implicits._
    val timeout =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"), col("ts"))
      .as[Touch]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        updateUser(idleTtlMs))
  }
}
