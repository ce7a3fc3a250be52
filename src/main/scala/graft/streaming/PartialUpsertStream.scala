package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.ops.Dedup.partialUpsert]] — Pinot's
  * partial-upsert mode IS an ingest-time feature: each arriving row
  * is a sparse patch, and the served row merges every field from the
  * latest patch that set it. State per key holds (value, order-key)
  * per field; a patch overwrites a field only when it sets it AND its
  * order key is newer — so the merge is order-insensitive across ANY
  * batch split (including out-of-order replays), and the final
  * profiles are exactly the batch operator's output.
  *
  * State at scale: one fixed-width row per live key — the served
  * profile itself, the same bound as Pinot's upsert metadata map.
  * Emission is update-mode: a key's current merged profile whenever
  * it receives patches.
  */
object PartialUpsertStream {

  /** A sparse patch: `ord` totally orders patches; None = "this
    * patch does not set the field".
    */
  case class Patch(user_id: Long, ord: String, typ: String,
      purchase_cents: Option[Long], click_ms: Option[Long])

  /** Per-field (order-key, value) state. Empty ord = never set. */
  case class St(typOrd: String, typ: String,
      pcOrd: String, pc: Option[Long],
      cmOrd: String, cm: Option[Long])

  case class Profile(user_id: Long, last_type: String,
      last_purchase_cents: Option[Long], last_click_ms: Option[Long])

  private val zero = St("", "", "", None, "", None)

  /** Fold patches into state — per-field newest-setter wins. */
  private[graft] def merge(st: St, patches: Iterator[Patch]): St =
    patches.foldLeft(st) { (s, p) =>
      var out = s
      if (p.ord > out.typOrd) out = out.copy(typOrd = p.ord, typ = p.typ)
      if (p.purchase_cents.isDefined && p.ord > out.pcOrd)
        out = out.copy(pcOrd = p.ord, pc = p.purchase_cents)
      if (p.click_ms.isDefined && p.ord > out.cmOrd)
        out = out.copy(cmOrd = p.ord, cm = p.click_ms)
      out
    }

  private def update(key: Long, it: Iterator[Patch],
      state: GroupState[St]): Profile = {
    val st = merge(state.getOption.getOrElse(zero), it)
    state.update(st)
    Profile(key, st.typ, st.pc, st.cm)
  }

  /** Update-mode merged profiles from a patch stream. */
  def profiles(spark: SparkSession, patches: Dataset[Patch]): Dataset[Profile] = {
    import spark.implicits._
    patches.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** The events→patches projection shared with the batch gate and
    * the served state ([[graft.ops.Dedup.profilePatches]]), so
    * stream-final ≡ batch is checkable row-for-row.
    */
  def patchesOf(spark: SparkSession, events: DataFrame): Dataset[Patch] = {
    import spark.implicits._
    graft.ops.Dedup.profilePatches(events).as[Patch]
  }
}
