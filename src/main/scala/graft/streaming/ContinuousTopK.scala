package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous per-key top-K with custom keyed state — the one
  * reference operator Spark's built-ins can't express (SURVEY §7.3):
  * Flink's TopKProcessFunction (ProcessFunctions.kt:62-134) keeps a
  * MapState of per-item metrics and re-emits the current top-K on
  * every update.
  *
  * `flatMapGroupsWithState` is the Spark analog: one state value per
  * group key, update-and-emit per micro-batch (per-batch emission
  * instead of per-element — the micro-batch analog of Flink's
  * per-element emission; same output grain as the reference's Kafka
  * consumer variant, KafkaConsumerTopKJob.kt:209-241).
  *
  * State is bounded like the reference bounds it: metrics are
  * truncated to the top `stateCap` items after each update
  * (ProcessFunctions.kt:105-115 truncates to k; we keep a slack
  * factor so near-boundary items can still climb back — fixing the
  * retention bug SURVEY §7.4 flags, deliberately per-window-free
  * running totals like the reference).
  */
object ContinuousTopK {

  case class ItemUpdate(groupKey: String, itemId: String, count: Long, valueCents: Long,
      ts: Timestamp = null)
  case class TopKState(metrics: Map[String, (Long, Long)])
  case class RankedItem(groupKey: String, rank: Int, itemId: String,
      count: Long, valueCents: Long)

  val defaultStateCap = 1000

  /** Erase sentinel: an update carrying this count removes the item's
    * running totals from the group's MapState entirely and the
    * corrected ranking re-emits — right-to-be-forgotten for a LIVE
    * leaderboard, one grain finer than [[StreamErase]]'s whole-key
    * tombstones (the user leaves the board, the board survives).
    * Tombstones ride the same stream as updates, so they checkpoint
    * and replay exactly-once like any event. Within a micro-batch the
    * group's updates fold in EVENT-TIME order (the shuffle feeding
    * flatMapGroupsWithState guarantees no arrival order), tombstones
    * before additions at equal timestamps — so an erase and a re-add
    * of the same item landing in one batch deterministically leave
    * the re-add counting from zero. Additive updates commute, so the
    * sort only ever matters to erase/re-add pairs; tombstones and
    * their re-adds should carry event timestamps (a null ts sorts
    * first).
    */
  val EraseCount: Long = Long.MinValue

  /** A tombstone update erasing `itemId` from `groupKey`'s state. */
  def eraseItem(groupKey: String, itemId: String,
      ts: Timestamp = null): ItemUpdate =
    ItemUpdate(groupKey, itemId, EraseCount, 0L, ts)

  def updateGroup(k: Int, stateCap: Int, idleTtlMs: Option[Long])(
      key: String,
      updates: Iterator[ItemUpdate],
      state: GroupState[TopKState]): Iterator[RankedItem] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // fold in event-time order, tombstones first at equal ts: the
      // post-shuffle Iterator has NO arrival order, and an unordered
      // fold could wipe a same-batch re-add instead of resetting it
      val evs = updates.toSeq.sortBy(u =>
        (Option(u.ts).map(_.getTime).getOrElse(Long.MinValue),
          if (u.count == EraseCount) 0L else 1L))
      val prev = state.getOption.map(_.metrics).getOrElse(Map.empty)
      val merged = evs.foldLeft(prev) { (m, u) =>
        if (u.count == EraseCount) m - u.itemId
        else {
          val (c0, v0) = m.getOrElse(u.itemId, (0L, 0L))
          m.updated(u.itemId, (c0 + u.count, v0 + u.valueCents))
        }
      }
      // bound state: keep top `stateCap` by (count, value, id)
      val bounded =
        if (merged.size <= stateCap) merged
        else merged.toSeq
          .sortBy { case (id, (c, v)) => (-c, -v, id) }
          .take(stateCap).toMap
      state.update(TopKState(bounded))
      // idle-key eviction: re-arm an event-time timer at (last update's
      // event time + TTL) — a key that stops receiving updates for
      // idleTtlMs of event time is dropped once the watermark passes
      // (parity-plus-one over the reference, which bounds state per key
      // but never drops idle keys — ProcessFunctions.kt:105-115).
      idleTtlMs.foreach { ttl =>
        val maxTs = evs.iterator.flatMap(u => Option(u.ts)).map(_.getTime) ++
          Iterator.single(state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(
          math.max(maxTs.max + ttl, state.getCurrentWatermarkMs() + 1))
      }
      val top = bounded.toSeq
        .sortBy { case (id, (c, v)) => (-c, -v, id) }
        .take(k)
      top.iterator.zipWithIndex.map { case ((id, (c, v)), i) =>
        RankedItem(key, i + 1, id, c, v)
      }
    }
  }

  /** Lift a stream of per-item updates into a continuously-updated
    * ranked stream. Input must already be keyed updates (e.g. from a
    * windowed pre-aggregation or raw events mapped 1:1).
    *
    * `idleTtlMs`: when set, group-key state is dropped after that much
    * event time without updates (requires a watermark on the input's
    * `ts` column); when None, state lives forever — only safe at
    * bounded key cardinality.
    */
  def rank(spark: SparkSession, updates: Dataset[ItemUpdate], k: Int,
      stateCap: Int = defaultStateCap, idleTtlMs: Option[Long] = None): Dataset[RankedItem] = {
    import spark.implicits._
    val timeout =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates
      .groupByKey(_.groupKey)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        updateGroup(k, stateCap, idleTtlMs))
  }
}
