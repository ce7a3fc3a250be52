package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the Markov transition matrix
  * ([[graft.queries.AnalyticsQueries.eventTransitions]]): per user,
  * the list of ADJACENT (from → to) event-type pairs under the
  * (tu, event_id) total order, maintained as an update-mode stream.
  * A late event SPLITS a settled pair — `a@1 b@9` + late `c@5` must
  * turn the counted a→b into a→c, c→b — so transition counts are not
  * additive over arrival batches and no pair-count-only state can be
  * correct. State is therefore the user's (tu, event_id, type) event
  * list, deduped by event_id (replay-idempotent by construction);
  * each update emits the user's COMPLETE current pair list, so
  * folding last-emission-per-user and counting globally equals the
  * batch operator under ANY batch split and ANY arrival order.
  *
  * State at scale: the per-user event list — the same per-group
  * bound as the batch operator's user-keyed lag window, held per key
  * in the state store; recompute is key-local. The global
  * count + permille normalization happens where the batch op does
  * it: a derive-at-read aggregation over the (bounded, alphabet²)
  * pair domain.
  */
object TransitionsStream {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value_cents: Long)

  /** One user's complete current adjacent-pair list (update-mode
    * emission — replaces any earlier emission for the key).
    */
  case class Pairs(user_id: Long, pairs: Seq[(String, String)])

  private[graft] def pairsOf(events: Seq[TypeHistoryStream.StEv]): Seq[(String, String)] = {
    val ordered = events.sortBy(e => (e.tu, e.id)).map(_.typ)
    ordered.zip(ordered.drop(1))
  }

  private def update(key: Long, it: Iterator[Ev],
      state: GroupState[TypeHistoryStream.St]): Pairs = {
    val prev = state.getOption.map(_.events).getOrElse(Seq.empty)
    val seen = prev.map(_.id).toSet
    val fresh = it.map(e => TypeHistoryStream.StEv(
        e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L,
        e.event_id, e.event_type))
      .filterNot(e => seen.contains(e.id)).toSeq
      .distinctBy(_.id)
    val merged = prev ++ fresh
    state.update(TypeHistoryStream.St(merged))
    Pairs(key, pairsOf(merged))
  }

  /** Update-mode per-user pair lists from an events stream. */
  def pairs(spark: SparkSession, events: DataFrame): Dataset[Pairs] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value_cents"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
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
      .select(col("p._1").as("from_type"), col("p._2").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("out_total", sum(col("n_trans")).over(wOut))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        column(IntegralDivide(
          expression(col("n_trans") * 1000L),
          expression(col("out_total")))).cast("long").as("share_permille"))
  }
}
