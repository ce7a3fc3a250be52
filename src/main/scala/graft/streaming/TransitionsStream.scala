package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the Markov transition matrix
  * ([[graft.queries.AnalyticsQueries.eventTransitions]]): per user,
  * the counts of ADJACENT (from → to) event-type pairs under the
  * (tu, event_id) total order, maintained as an update-mode stream.
  * A late event SPLITS a settled pair — `a@1 b@9` + late `c@5` must
  * turn the counted a→b into a→c, c→b — so transition counts are not
  * additive over arrival batches and no pair-count-only state can be
  * correct for events still inside the admissible-lateness window.
  *
  * State at scale — the watermark-horizon fold: only events within
  * `horizonUs` of the key's max seen event time can still be split
  * by an admissible late arrival (the pipeline's W2 lateness
  * contract; the reference drops beyond-watermark events too,
  * TopKStreamingJob.kt:248-249). Older events are SETTLED into
  * (from, to) → n pair counts — bounded by the event-type alphabet
  * squared — plus the single boundary event that splices the settled
  * region onto the live tail; only the within-horizon tail stays a
  * raw list, deduped by event_id (replay-idempotent: a replayed
  * settled event sorts at-or-before the boundary and is dropped like
  * a beyond-horizon arrival). Each update emits the key's COMPLETE
  * current pair-count list (alphabet²-bounded — NOT the raw pair
  * list, which would grow with the key's event count), so folding
  * last-emission-per-user and summing globally equals the batch
  * operator under ANY batch split and ANY in-contract arrival order.
  * Optional `idleTtl` evicts keys idle past the duration
  * (processing-time timer — the [[PerElementTopK]] guarantee).
  *
  * The global count + permille normalization happens where the batch
  * op does it: [[matrixOf]], a derive-at-read aggregation over the
  * (bounded, alphabet²) pair domain.
  */
object TransitionsStream {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value_cents: Long)

  /** One (from → to) adjacent-pair count. */
  case class PairCount(from_type: String, to_type: String, n: Long)

  /** One user's complete current pair counts (update-mode emission —
    * replaces any earlier emission for the key; alphabet²-bounded).
    */
  case class Pairs(user_id: Long, pairs: Seq[PairCount])

  /** Bounded per-key state: settled pair counts (alphabet²), the
    * last settled event as splice boundary + late-drop bound, and
    * the raw within-horizon tail (sorted by (tu, id)).
    */
  case class St(settled: Seq[PairCount], boundary: Option[TypeHistoryStream.StEv],
      tail: Seq[TypeHistoryStream.StEv], maxTu: Long)

  val emptySt: St = St(Vector.empty, None, Vector.empty, Long.MinValue)

  /** Pure state transition — same admit/settle contract as
    * [[TypeHistoryStream.step]]; settling event e increments the
    * (boundary.typ → e.typ) count and advances the boundary.
    */
  private[graft] def step(st: St, fresh0: Seq[TypeHistoryStream.StEv],
      horizonUs: Long): St = {
    val seen = st.tail.iterator.map(_.id).toSet
    val fresh = fresh0.distinctBy(_.id)
      .filterNot(e => seen.contains(e.id))
      .filter(e => st.boundary.forall(b => TypeHistoryStream.after(e, b)))
    val merged = (st.tail ++ fresh).sortBy(e => (e.tu, e.id))
    val maxTu = if (merged.isEmpty) st.maxTu
      else math.max(st.maxTu, merged.last.tu)
    val threshold =
      if (maxTu == Long.MinValue) Long.MinValue else maxTu - horizonUs
    val (toSettle, keep) = merged.span(_.tu <= threshold)
    var counts = st.settled.map(p => (p.from_type, p.to_type) -> p.n).toMap
    var boundary = st.boundary
    toSettle.foreach { e =>
      boundary.foreach { b =>
        val k = (b.typ, e.typ)
        counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
      }
      boundary = Some(e)
    }
    val settled = counts.toSeq.sortBy { case ((f, t), _) => (f, t) }
      .map { case ((f, t), n) => PairCount(f, t, n) }
    St(settled, boundary, keep, maxTu)
  }

  /** The key's complete current pair counts from bounded state:
    * settled counts merged with the (boundary ++ tail) live pairs.
    */
  private[graft] def countsFromState(st: St): Seq[PairCount] = {
    val live = st.boundary.toSeq ++ st.tail
    var counts = st.settled.map(p => (p.from_type, p.to_type) -> p.n).toMap
    live.zip(live.drop(1)).foreach { case (a, b) =>
      val k = (a.typ, b.typ)
      counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
    }
    counts.toSeq.sortBy { case ((f, t), _) => (f, t) }
      .map { case ((f, t), n) => PairCount(f, t, n) }
  }

  private def update(horizonUs: Long, idleTtl: Option[java.time.Duration])(
      key: Long, it: Iterator[Ev],
      state: GroupState[St]): Iterator[Pairs] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = it.toSeq
      // GDPR tombstone ([[StreamErase]]): drop the key's state and
      // emit cleared pair counts (erase-wins within the batch)
      if (StreamErase.requested(evs.iterator.map(_.event_type))) {
        state.remove()
        Iterator.single(Pairs(key, Seq.empty))
      } else {
        val next = step(state.getOption.getOrElse(emptySt),
          evs.map(e => TypeHistoryStream.StEv(
            e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L,
            e.event_id, e.event_type)), horizonUs)
        state.update(next)
        idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
        Iterator.single(Pairs(key, countsFromState(next)))
      }
    }
  }

  /** Update-mode per-user pair counts from an events stream.
    * `horizonUs` is the admissible event-time lateness; `idleTtl`
    * (processing-time) evicts keys idle past the duration.
    */
  def pairs(spark: SparkSession, events: DataFrame,
      horizonUs: Long = TypeHistoryStream.defaultHorizonUs,
      idleTtl: Option[java.time.Duration] = None): Dataset[Pairs] = {
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

  /** Fold a frame of (user_id, pairs) LAST emissions into the batch
    * operator's output shape: global (from, to) counts + exact
    * integer permille share per from-type. Derive-at-read over the
    * bounded alphabet² domain.
    */
  def matrixOf(emissions: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftShim.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val wOut = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    emissions
      .select(explode(col("pairs")).as("p"))
      .select(col("p.from_type").as("from_type"),
        col("p.to_type").as("to_type"), col("p.n").as("n"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).cast("long").as("n_trans"))
      .withColumn("out_total", sum(col("n_trans")).over(wOut))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        column(IntegralDivide(
          expression(col("n_trans") * 1000L),
          expression(col("out_total")))).cast("long").as("share_permille"))
  }
}
