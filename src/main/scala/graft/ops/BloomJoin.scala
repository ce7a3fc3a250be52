package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomExprs

/** Bloom-pruned semi join (see [[graft.functions.BloomMightContainLong]]
  * for the scale rationale).
  *
  * Two phases:
  *  1. build: one pass over the (small) build side collects a bloom
  *     sketch of its keys — a bounded driver artifact like a broadcast
  *     relation, sized by `expectedItems`/`fpp`, never by the fact;
  *  2. probe: the fact scan filters through the codegen'd probe — a
  *     false-positive-rate `fpp` superset of the true matches — and
  *     only the survivors enter the exact `left_semi` join that
  *     removes the false positives.
  *
  * Exactness does NOT depend on the sketch: blooms have no false
  * negatives, so filter∘semi-join ≡ semi-join (the gate hash-checks
  * this against a plain IN-subquery oracle). The sketch only cuts the
  * volume entering the exchange — at 1% fpp a 95%-selective prune
  * shrinks the fact-side shuffle ~20×.
  */
object BloomJoin {

  /** Serialized bloom sketch of `dim`'s `key` column (bigint). */
  def buildSketch(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bloom = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)` with the
    * fact side pre-pruned by a bloom of `dim`'s keys.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val sketch = buildSketch(dim, dimKey, expectedItems, fpp)
    // rename the dim key so factKey == dimKey (the common case for
    // shared key names) doesn't hit an ambiguous-reference error
    val dimKeys = dim.select(col(dimKey).as("__graft_bloom_key"))
    fact
      .filter(BloomExprs.might_contain_long(col(factKey), sketch))
      .join(dimKeys, col(factKey) === col("__graft_bloom_key"), "left_semi")
  }
}
