package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash-partitioned join sends every row of a hot key to one task;
  * at 100 TB a single over-represented key (the null-ish default, the
  * bot user, the empty document) turns a 1000-executor join into a
  * one-straggler job. Salting splits each big-side key into `salts`
  * sub-keys and replicates the matching small-side rows across all of
  * them, so the hot key's rows spread over `salts` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * does this adaptively for sort-merge joins; the explicit form here
  * covers the cases AQE doesn't reach (e.g. when the skewed side
  * must stay hash-partitioned for a downstream op) and makes the
  * technique unit-testable. Join semantics are unchanged: the salt is
  * an added equi-join column, every (row-pair) match occurs exactly
  * once.
  *
  * The salt assignment (`monotonically_increasing_id % salts`) is not
  * stable across task retries — harmless, since ANY assignment yields
  * the same join result; do not key persisted state off the salt.
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
