package graft.streaming

/** In-band user erasure for CHECKPOINTED keyed stream state — the
  * leg of right-to-be-forgotten that neither
  * [[graft.serving.Serving.eraseUser]] (serving partitions) nor
  * [[StateCompactor.eraseWhere]] (file-state roots) can reach: state
  * living inside a running query's state store can only be changed
  * through the stream itself. The mechanism is the standard GDPR
  * tombstone record: an event whose `event_type` is [[Marker]],
  * keyed to the user, makes the stateful operator DROP the key's
  * state and emit a CLEARED emission (empty pairs / empty history /
  * empty offsets / zero bursts), which replaces the user's last
  * emission in any update-mode downstream fold — so the fold equals
  * a rebuild without the user. The reference's stack clears Flink
  * keyed state the same way (state.clear() on a control record).
  *
  * Contract mirrors the quiesced-slot file erase: route the marker
  * AFTER the user's in-flight traffic (a marker and ordinary events
  * racing in one micro-batch resolve as erase-wins — the batch's
  * other events for that key are discarded with the state, and the
  * operator documents that). Replays are no-ops: a re-delivered
  * marker clears already-empty state and re-emits the same cleared
  * emission. Events arriving after the erase start the key fresh —
  * the erased history cannot resurface because it no longer exists
  * anywhere.
  */
object StreamErase {

  /** The tombstone event type. Never a real event type. */
  val Marker = "__erase__"

  /** True when a micro-batch slice for one key contains a tombstone. */
  def requested(types: Iterator[String]): Boolean =
    types.contains(Marker)
}
