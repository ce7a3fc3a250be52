package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operators don't express directly:
  * as-of (latest-prior match) and bounded-interval range join.
  *
  * Both are composed from equi-shuffle primitives — the preference
  * order of SURVEY §7.3: no theta-join ever reaches the planner, so
  * Spark never falls back to a BroadcastNestedLoop/cartesian plan.
  *
  *  - `asOf` is the union-merge formulation: tag both inputs, union,
  *    and per key take `last(payload, ignoreNulls)` over the
  *    (ts, side, tie) sort order. Cost = ONE shuffle on the key +
  *    a per-partition sort — the same plan shape as a windowed
  *    aggregation, and the standard distributed as-of at any scale
  *    (a sort-merge as-of over co-partitioned inputs). Like every
  *    keyed window, one key's rows sort inside one partition — a
  *    pathologically hot key spills (doesn't break); salting is not
  *    applicable because the running order per key IS the semantics.
  *  - `rangeJoin` bucketizes time by the interval width so each left
  *    row lands in at most 2 buckets; the bucket id becomes an
  *    equi-join key and the exact interval predicate filters the
  *    bucket-pair candidates. Shuffle partitions by (key, bucket) —
  *    temporal locality gives even partitions at 100 TB.
  */
object AsOfJoin {

  /** For each left row, attach `payload` columns from the latest
    * right row with the same `keys` and `right.tsCol <= left.tsCol`
    * (nulls when no prior right row exists). Ties on ts admit the
    * right row (<= semantics); among right rows with equal ts the
    * largest `tieCol` wins — fully deterministic.
    *
    * Output: every left column, then `payload` columns renamed with
    * `prefix`.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema("_p").dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType

    // side 0 = right (visible at equal ts), side 1 = left.
    val rU = right.select(keyCols ++ Seq(col(tsCol).as("_ats"),
      col(tieCol).as("_atie"), lit(0).as("_aside"),
      pStruct.as("_p"), lit(null).cast(lType).as("_l")): _*)
    val lU = left.select(keyCols ++ Seq(col(tsCol).as("_ats"),
      col(tieCol).as("_atie"), lit(1).as("_aside"),
      lit(null).cast(pType).as("_p"), lStruct.as("_l")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ats").asc, col("_aside").asc, col("_atie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lU.unionByName(rU)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_aside") === 1)
      .select(leftCols.map(n => col("_l").getField(n).as(n)) ++
        payload.map(n => col("_m").getField(n).as(prefix + n)): _*)
  }

  /** All (left, right) pairs with equal `keys` and
    * `right.rightTs ∈ [left.leftTs + loUs, left.leftTs + hiUs]`
    * (µs offsets, lo < hi). Column names of the two inputs must be
    * disjoint apart from `keys`; output carries all of them.
    *
    * Each left row explodes into the (≤2) time buckets of width
    * (hi-lo) its window can touch; right rows sit in exactly one
    * bucket — the interval predicate only ever runs on bucket-pair
    * candidates, never on a cross product.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, loUs: Long, hiUs: Long): DataFrame = {
    require(hiUs > loUs, s"empty interval [$loUs, $hiUs]")
    val width = hiUs - loUs
    val lt = unix_micros(col(leftTs))
    val rt = unix_micros(col(rightTs))
    // Exact long bucket id: Spark's `/` is double division, and
    // floor(µs/width) in doubles can land off-by-one near bucket
    // edges. Subtracting the remainder first makes the quotient exact.
    def bucketOf(t: org.apache.spark.sql.Column) =
      ((t - pmod(t, lit(width))) / width).cast("long")
    val l = left.withColumn("_bk",
      explode(array_distinct(array(bucketOf(lt + loUs), bucketOf(lt + hiUs)))))
    val r = right.withColumn("_bk", bucketOf(rt))
    l.join(r, keys :+ "_bk")
      .filter(rt.between(lt + loUs, lt + hiUs))
      .drop("_bk")
  }
}
