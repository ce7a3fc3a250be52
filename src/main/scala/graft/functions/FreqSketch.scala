package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a native typed aggregate —
  * the FREQUENTSTRINGSSKETCH-style capability: top heavy hitters of a
  * string column in bounded space, mergeable across partitions (the
  * partial/final aggregation Spark plans for any Aggregator).
  *
  * Guarantees (k counters over n rows):
  *  - every item with true count > n/(k+1) is present in the output;
  *  - for present items, true - n/(k+1) <= est <= true;
  *  - when the column has <= k distinct values the sketch is EXACT
  *    (no decrement ever fires) — which is what lets the gate entry
  *    hash-check it against a plain GROUP BY, with the approximate
  *    regime covered by FreqSketchSpec's bound assertions.
  *
  * Merge is the Agarwal et al. (PODS'12) mergeable-summaries rule:
  * sum counters, then subtract the (k+1)-largest count and drop
  * non-positive — keeps the additive error bound under arbitrary
  * merge trees, so a 1000-executor partial-agg plan is as accurate
  * as a single-pass scan.
  */
object FreqSketch {

  /** Sketch state: parallel arrays (encoder-friendly — Spark derives
    * a product encoder; a Map buffer would need Kryo).
    */
  case class Buf(items: Array[String], counts: Array[Long], n: Long)

  case class Item(item: String, est: Long)

  class FreqItemsAgg(k: Int) extends Aggregator[String, Buf, Array[Item]] {
    require(k > 0, s"k must be positive, got $k")

    def zero: Buf = Buf(Array.empty, Array.empty, 0L)

    def reduce(b: Buf, item: String): Buf = {
      if (item == null) return b
      val i = b.items.indexOf(item)
      if (i >= 0) { b.counts(i) += 1; b.copy(n = b.n + 1) }
      else if (b.items.length < k)
        Buf(b.items :+ item, b.counts :+ 1L, b.n + 1)
      else {
        // MG step: a full sketch meeting a new item decrements all
        val kept = b.items.indices.filter(j => b.counts(j) > 1)
        Buf(kept.map(b.items).toArray,
          kept.map(j => b.counts(j) - 1).toArray, b.n + 1)
      }
    }

    def merge(a: Buf, b: Buf): Buf = {
      val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      a.items.indices.foreach(i => sums(a.items(i)) = a.counts(i))
      b.items.indices.foreach(i =>
        sums(b.items(i)) = sums.getOrElse(b.items(i), 0L) + b.counts(i))
      val trimmed =
        if (sums.size <= k) sums.toSeq
        else {
          val cut = sums.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sums.toSeq.map { case (it, c) => (it, c - cut) }.filter(_._2 > 0)
        }
      Buf(trimmed.map(_._1).toArray, trimmed.map(_._2).toArray, a.n + b.n)
    }

    def finish(b: Buf): Array[Item] =
      b.items.indices.map(i => Item(b.items(i), b.counts(i)))
        .sortBy(it => (-it.est, it.item)).toArray

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Array[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Item]]()
  }

  /** Column form: `freq_items(col, k)` → array<struct<item, est>>
    * sorted by (est desc, item asc).
    */
  def freq_items(c: Column, k: Int): Column =
    udaf(new FreqItemsAgg(k), Encoders.STRING).apply(c)
}
