package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact mergeable distinct-count bitmap — the analog of Pinot's
  * DISTINCTCOUNTBITMAP / DISTINCTCOUNTBITMAPMV aggregations (the
  * exact sibling of the reference's DISTINCTCOUNTHLL column,
  * orders_1m_rollup_table.json): a compressed bitset over an integer
  * key domain whose merge is bitwise OR, so re-aggregating stored
  * per-grain states (day → month, type → all) reproduces the EXACT
  * distinct count — the one thing the HLL/KMV sketch family
  * fundamentally cannot promise. The gates therefore hash-check the
  * counts against plain `COUNT(DISTINCT …)` oracles with no
  * tolerance band and no cross-engine sketch reproduction at all:
  * only exact integers cross the engine boundary.
  *
  * Representation: sparse fixed-size pages. A page covers
  * [[PageBits]] consecutive ids ([[PageWords]] longs); state is the
  * sorted array of materialized page ids plus their word blocks
  * (`words.length == pages.length * PageWords`). reduce sets one
  * bit (allocating the page on first touch); merge is a sorted
  * page-id merge join OR-ing word blocks — associative, commutative,
  * idempotent, so a 1000-executor partial-agg tree yields
  * bit-identical state to a single pass and "refresh" of a stored
  * state with a new batch is the same OR.
  *
  * Scale contract: state is Θ(materialized pages), i.e. linear in
  * the OCCUPIED id range (≤ |domain|/8 bytes + page index), not in
  * row count — the standard exact-bitmap tradeoff Pinot makes:
  * perfect for dictionary/dense surrogate keys (user ids), wrong
  * for ad-hoc 64-bit hashes, which is what [[KmvSketch]] is for.
  */
object BitmapDistinct {

  /** ids per page (bits) — 8 longs. */
  val PageWords = 8
  val PageBits: Int = PageWords * 64

  /** Bitmap state: `pages` sorted ascending; `words(i*PageWords ..
    * (i+1)*PageWords)` are page `pages(i)`'s bits.
    */
  case class Bm(pages: Array[Long], words: Array[Long])

  private val empty = Bm(Array.empty, Array.empty)

  private def setBit(b: Bm, id: Long): Bm = {
    val page = java.lang.Math.floorDiv(id, PageBits.toLong)
    val bit = java.lang.Math.floorMod(id, PageBits.toLong).toInt
    val (w, m) = (bit >>> 6, 1L << (bit & 63))
    val i = java.util.Arrays.binarySearch(b.pages, page)
    if (i >= 0) {
      val off = i * PageWords + w
      if ((b.words(off) & m) != 0) return b // bit already set
      val words = b.words.clone(); words(off) |= m
      Bm(b.pages, words)
    } else {
      val ins = -i - 1
      val pages = new Array[Long](b.pages.length + 1)
      System.arraycopy(b.pages, 0, pages, 0, ins)
      pages(ins) = page
      System.arraycopy(b.pages, ins, pages, ins + 1, b.pages.length - ins)
      val words = new Array[Long](b.words.length + PageWords)
      System.arraycopy(b.words, 0, words, 0, ins * PageWords)
      words(ins * PageWords + w) = m
      System.arraycopy(b.words, ins * PageWords, words, (ins + 1) * PageWords,
        b.words.length - ins * PageWords)
      Bm(pages, words)
    }
  }

  private def or(a: Bm, b: Bm): Bm = {
    if (a.pages.isEmpty) return b
    if (b.pages.isEmpty) return a
    // merge join over the two sorted page-id arrays
    val maxP = a.pages.length + b.pages.length
    val pages = new Array[Long](maxP)
    val words = new Array[Long](maxP * PageWords)
    var (i, j, o) = (0, 0, 0)
    while (i < a.pages.length || j < b.pages.length) {
      val takeA = j >= b.pages.length ||
        (i < a.pages.length && a.pages(i) <= b.pages(j))
      val takeB = i >= a.pages.length ||
        (j < b.pages.length && b.pages(j) <= a.pages(i))
      pages(o) = if (takeA) a.pages(i) else b.pages(j)
      if (takeA)
        System.arraycopy(a.words, i * PageWords, words, o * PageWords, PageWords)
      if (takeB) {
        var w = 0
        while (w < PageWords) {
          words(o * PageWords + w) |= b.words(j * PageWords + w); w += 1
        }
      }
      if (takeA) i += 1
      if (takeB) j += 1
      o += 1
    }
    if (o == maxP) Bm(pages, words)
    else Bm(java.util.Arrays.copyOf(pages, o),
      java.util.Arrays.copyOf(words, o * PageWords))
  }

  class BitmapAgg extends Aggregator[Long, Bm, Bm] {
    def zero: Bm = empty
    def reduce(b: Bm, id: Long): Bm = setBit(b, id)
    def merge(a: Bm, b: Bm): Bm = or(a, b)
    def finish(b: Bm): Bm = b
    def bufferEncoder: Encoder[Bm] = Encoders.product[Bm]
    def outputEncoder: Encoder[Bm] = Encoders.product[Bm]
  }

  /** Re-aggregation: OR-merge already-materialized bitmap states
    * (day grains → range) — the exact analog of HLL_MERGE.
    */
  class BitmapMergeAgg extends Aggregator[Bm, Bm, Bm] {
    def zero: Bm = empty
    def reduce(b: Bm, s: Bm): Bm = or(b, s)
    def merge(a: Bm, b: Bm): Bm = or(a, b)
    def finish(b: Bm): Bm = b
    def bufferEncoder: Encoder[Bm] = Encoders.product[Bm]
    def outputEncoder: Encoder[Bm] = Encoders.product[Bm]
  }

  /** Build a bitmap over a LONG id column. Nulls must be filtered
    * upstream (a null decodes to 0L through the scalaLong encoder
    * and would phantom-count id 0).
    */
  def bitmap(id: Column): Column =
    udaf(new BitmapAgg, Encoders.scalaLong).apply(id)

  /** OR-merge a column of bitmap states into one. (A product input
    * encoder makes the UDAF n-ary — one argument per field — so the
    * struct is passed as its two array fields.)
    */
  def bitmapMerge(state: Column): Column =
    udaf(new BitmapMergeAgg, Encoders.product[Bm])
      .apply(state.getField("pages"), state.getField("words"))

  /** Exact cardinality of a bitmap state: Σ bit_count(word) — pure
    * codegen'd array arithmetic, no UDF.
    */
  def cardinality(state: Column): Column =
    coalesce(
      aggregate(state.getField("words"), lit(0L),
        (acc, w) => acc + call_function("bit_count", w).cast("long")),
      lit(0L))
}
