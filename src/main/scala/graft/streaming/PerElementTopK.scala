package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import ContinuousTopK.ItemUpdate

/** K1 at the reference's exact emission grain: Flink's
  * TopKProcessFunction re-emits the FULL current top-K on EVERY
  * element (ProcessFunctions.kt:96-116), not once per window or
  * batch. [[ContinuousTopK]] (flatMapGroupsWithState) can only emit
  * per micro-batch; `transformWithState` — Spark 4's arbitrary
  * stateful processing API — hands the processor the row iterator,
  * so it can fold state and emit one ranked snapshot PER INPUT ROW,
  * closing the one documented emission-grain deviation from the
  * reference.
  *
  * Output rows carry `seq`, the per-key monotone element counter
  * (persisted in state, so it keeps counting across batches and
  * restarts) — the stream-position handle Flink consumers get from
  * ordering within the keyed stream.
  *
  * State is bounded exactly like [[ContinuousTopK]]: metrics truncate
  * to the top `stateCap` items after each element
  * (ProcessFunctions.kt:105-115 truncates to k; the slack lets
  * near-boundary items climb back).
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`), a transformWithState
  * constraint in Spark 4.
  *
  * Idle-key state TTL: pass `idleTtl` to bound state at high key
  * cardinality, the same guarantee [[ContinuousTopK]] gives via its
  * event-time timer. transformWithState's native `TTLConfig` is
  * processing-time based (the only mode the API supports), so the
  * run switches to `TimeMode.ProcessingTime`; a key idle past the
  * TTL has its snapshot dropped by the state store itself — the next
  * element for that key starts a fresh snapshot (seq restarts at 1).
  * Without `idleTtl` the behavior is unchanged (`TimeMode.None`,
  * `TTLConfig.NONE`) and state is bounded only per-key by `stateCap`.
  */
object PerElementTopK {

  case class ElementRanked(groupKey: String, seq: Long, rank: Int, itemId: String,
      count: Long, valueCents: Long)

  case class TopKSnapshot(seq: Long, metrics: Map[String, (Long, Long)])

  class Processor(k: Int, stateCap: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, ItemUpdate, ElementRanked] {
    @transient private var st: ValueState[TopKSnapshot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TopKSnapshot]("topk",
        Encoders.product[TopKSnapshot], ttl)

    override def handleInputRows(key: String, rows: Iterator[ItemUpdate],
        timerValues: TimerValues): Iterator[ElementRanked] = {
      var cur = Option(st.get()).getOrElse(TopKSnapshot(0L, Map.empty))
      val out = Seq.newBuilder[ElementRanked]
      // fold in event-time order, tombstones first at equal ts (the
      // ContinuousTopK.updateGroup rule): the post-shuffle iterator
      // has no arrival order, and an unordered fold could wipe a
      // same-batch re-add instead of resetting it
      val ordered = rows.toSeq.sortBy(u =>
        (Option(u.ts).map(_.getTime).getOrElse(Long.MinValue),
          if (u.count == ContinuousTopK.EraseCount) 0L else 1L))
      ordered.foreach { u =>
        // ContinuousTopK.EraseCount tombstone: the item's running
        // totals leave the snapshot, the corrected board re-emits
        var m =
          if (u.count == ContinuousTopK.EraseCount) cur.metrics - u.itemId
          else {
            val (c0, v0) = cur.metrics.getOrElse(u.itemId, (0L, 0L))
            cur.metrics.updated(u.itemId, (c0 + u.count, v0 + u.valueCents))
          }
        if (m.size > stateCap)
          m = m.toSeq.sortBy { case (id, (c, v)) => (-c, -v, id) }
            .take(stateCap).toMap
        cur = TopKSnapshot(cur.seq + 1, m)
        m.toSeq.sortBy { case (id, (c, v)) => (-c, -v, id) }.take(k)
          .zipWithIndex.foreach { case ((id, (c, v)), i) =>
            out += ElementRanked(key, cur.seq, i + 1, id, c, v)
          }
      }
      st.update(cur)
      out.result().iterator
    }
  }

  /** Lift a keyed update stream into a per-ELEMENT ranked stream.
    * `idleTtl` (processing-time) evicts snapshots for keys idle past
    * the duration — see the object doc for semantics.
    */
  def rank(spark: SparkSession, updates: Dataset[ItemUpdate], k: Int,
      stateCap: Int = ContinuousTopK.defaultStateCap,
      idleTtl: Option[java.time.Duration] = None): Dataset[ElementRanked] = {
    import spark.implicits._
    val (timeMode, ttlConfig) = idleTtl match {
      case Some(d) => (TimeMode.ProcessingTime(), TTLConfig(d))
      case None    => (TimeMode.None(), TTLConfig.NONE)
    }
    updates
      .groupByKey(_.groupKey)
      .transformWithState(new Processor(k, stateCap, ttlConfig),
        timeMode, OutputMode.Append())
  }
}
