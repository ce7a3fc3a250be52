package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of
  * [[graft.ops.AsOfJoin.rangeJoin]]: pairs rows of two event streams
  * on equal keys with `right.ts ∈ [left.ts, left.ts + hi]`.
  *
  * Both sides carry a watermark and the join condition carries the
  * time range, which is exactly what lets Spark bound the join state:
  * a buffered left row can be dropped once the right watermark passes
  * `left.ts + hi`, and vice versa — without the range condition the
  * state would grow forever. The same code path runs on batch frames
  * (withWatermark is a no-op there), so batch/streaming parity is a
  * test, not a hope.
  */
object StreamJoin {

  /** Inner interval join. `keys` must exist on both sides (right's
    * are dropped from the output); all other column names must be
    * disjoint. `hi` is an interval literal like "5 minutes";
    * `watermarkDelay` bounds out-of-order tolerance and state size.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, hi: String,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = keys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"_r_$k"))
      .withWatermark(rightTs, watermarkDelay)
    val cond = keys.map(k => col(k) === col(s"_r_$k")).reduce(_ && _) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $hi")
    l.join(r, cond).drop(keys.map(k => s"_r_$k"): _*)
  }

  /** General µs-bounded interval join with a caller-chosen join type:
    * `right.rightTs ∈ [left.leftTs + loUs, left.leftTs + hiUs]`
    * (negative lo = lookback). `leftOuter` emits null-padded left
    * rows once the right watermark passes `leftTs + hiUs` — the
    * streaming "no match within the window" decision; the explicit
    * bounds are what let Spark evict buffered state on BOTH sides.
    */
  def intervalJoinBounds(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      loUs: Long, hiUs: Long, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(hiUs >= loUs, s"empty interval [$loUs, $hiUs]")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = keys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"_r_$k"))
      .withWatermark(rightTs, watermarkDelay)
    val cond = keys.map(k => col(k) === col(s"_r_$k")).reduce(_ && _) &&
      col(rightTs) >= col(leftTs) + expr(s"INTERVAL $loUs microseconds") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $hiUs microseconds")
    l.join(r, cond, joinType).drop(keys.map(k => s"_r_$k"): _*)
  }
}
