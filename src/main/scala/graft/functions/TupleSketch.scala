package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Tuple sketch: a KMV/theta distinct sketch whose retained entries
  * each carry an exact integer SUMMARY (sum of a metric for that
  * key) — the DataSketches "tuple sketch with integer-sum summary",
  * Pinot's SUMVALUESINTEGERSUMTUPLESKETCH / segment-tuple-sketch
  * analog (the capability layered over DISTINCTCOUNTTHETASKETCH when
  * the question is "METRIC over a set expression", e.g. revenue from
  * users who clicked AND purchased — unanswerable from two separate
  * aggregates without a raw join).
  *
  * State is the [[KmvSketch]] bottom-k hash array plus a parallel
  * value array. A key is inserted on its first row (hashes only ever
  * leave when a smaller one displaces them, and a displaced key's
  * later rows hash ≥ the shrinking threshold, so they never
  * half-count): every retained entry's sum covers ALL of its key's
  * rows — exact, which makes merge (k-way min-merge, summing values
  * on equal hashes) associative, commutative, and bit-identical to a
  * single pass. The gate therefore hash-checks the ESTIMATES, like
  * the KMV family.
  *
  * Estimators: distinct per [[KmvSketch.estimate]]; metric totals by
  * sample-sum scale-up, est = (Σ v over entries < θ) · M div θ — an
  * unfilled sketch has θ = M, so the estimate degrades gracefully to
  * the exact sum. Set-op metrics compose through the same θ algebra
  * as KMV samples (min of operand thresholds, entries strictly
  * below).
  */
object TupleSketch {

  /** Sketch: hashes sorted ascending (≤ k, distinct), vs aligned. */
  case class Sk(hs: Array[Long], vs: Array[Long])

  /** Mutable buffer — same shape; vs entries accumulate in place. */
  case class Buf(hs: Array[Long], vs: Array[Long])

  class TupleAgg(k: Int) extends Aggregator[(Long, Long), Buf, Sk] {
    require(k > 1, s"k must be > 1, got $k")

    def zero: Buf = Buf(Array.empty, Array.empty)

    def reduce(b: Buf, in: (Long, Long)): Buf = {
      val (h, v) = in
      val a = b.hs
      // saturated fast path (see KmvAgg): once full, almost every row
      // is either an ignored large hash or a retained-key accumulate
      if (a.length == k && h > a(k - 1)) return b
      val i = java.util.Arrays.binarySearch(a, h)
      if (i >= 0) { b.vs(i) += v; return b }
      val ins = -i - 1
      val n = math.min(a.length + 1, k)
      val oh = new Array[Long](n)
      val ov = new Array[Long](n)
      System.arraycopy(a, 0, oh, 0, ins)
      System.arraycopy(b.vs, 0, ov, 0, ins)
      oh(ins) = h
      ov(ins) = v
      System.arraycopy(a, ins, oh, ins + 1, n - 1 - ins)
      System.arraycopy(b.vs, ins, ov, ins + 1, n - 1 - ins)
      Buf(oh, ov)
    }

    def merge(a: Buf, b: Buf): Buf = {
      if (a.hs.isEmpty) return b
      if (b.hs.isEmpty) return a
      val n = math.min(a.hs.length + b.hs.length, k)
      val oh = new Array[Long](n)
      val ov = new Array[Long](n)
      var (i, j, o) = (0, 0, 0)
      while (o < n && (i < a.hs.length || j < b.hs.length)) {
        if (j >= b.hs.length || (i < a.hs.length && a.hs(i) < b.hs(j))) {
          oh(o) = a.hs(i); ov(o) = a.vs(i); i += 1
        } else if (i >= a.hs.length || b.hs(j) < a.hs(i)) {
          oh(o) = b.hs(j); ov(o) = b.vs(j); j += 1
        } else { // equal hash: one entry, summed summaries
          oh(o) = a.hs(i); ov(o) = a.vs(i) + b.vs(j); i += 1; j += 1
        }
        o += 1
      }
      Buf(
        if (o == n) oh else java.util.Arrays.copyOf(oh, o),
        if (o == n) ov else java.util.Arrays.copyOf(ov, o))
    }

    def finish(b: Buf): Sk = Sk(b.hs, b.vs)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Sk] = Encoders.product[Sk]
  }

  /** Column form: `tupleSk(hash, value, k)` → struct(hs, vs). Feed it
    * [[KmvSketch.keyHash]] output and an exact integer metric
    * (cents). Non-null keys required, same as [[KmvSketch.kmv]].
    */
  def tupleSk(h: Column, v: Column, k: Int): Column =
    udaf(new TupleAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(h, v)

  /** An empty sketch literal — coalesce target for absent groups. */
  def emptySk: Column =
    struct(
      array().cast("array<bigint>").as("hs"),
      array().cast("array<bigint>").as("vs"))

  /** Metric sum over entries strictly below a threshold (the
    * sample-sum half of every estimator; exact when θ = M).
    */
  def sumBelow(sk: Column, thetaCol: Column): Column =
    aggregate(
      zip_with(sk.getField("hs"), sk.getField("vs"),
        (h, v) => when(h < thetaCol, v).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Metric sum over entries below θ that also appear in `otherHs`
    * (a composed-θ sample hash array) — the intersection summary.
    */
  def sumBelowIn(sk: Column, thetaCol: Column, otherHs: Column): Column =
    aggregate(
      zip_with(sk.getField("hs"), sk.getField("vs"),
        (h, v) =>
          when(h < thetaCol && array_contains(otherHs, h), v).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
}
