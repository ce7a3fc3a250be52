package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k theta) distinct sketch as a native
  * typed aggregate — the capability HLL (`ops/Rollup.rollup1mHll`)
  * cannot provide: set DIFFERENCE (and exact-sample intersection)
  * estimates between sketches, Pinot's DISTINCTCOUNTTHETASKETCH
  * analog (reference surface: the DISTINCTCOUNTHLL family,
  * orders_1m_rollup_table.json — theta is the set-expression upgrade
  * of that same sketch column idea).
  *
  * State is the k smallest DISTINCT 60-bit hashes of the keys seen —
  * a sorted array, so the buffer is bounded (k longs) no matter how
  * many rows flow through, and merge (k-way min-merge of two sorted
  * arrays) is associative and commutative: a 1000-executor
  * partial-agg tree yields bit-identical state to a single pass,
  * which is what lets the gate hash-check ESTIMATES, not just an
  * `est_ok` tolerance bit — every number is md5-derived integer
  * arithmetic both engines reproduce exactly (same trick as
  * [[Text.hashBucket]], DuckDB mirror
  * `('0x' || substring(md5(x),1,15))::BIGINT`).
  *
  * Estimator (Beyer et al. SIGMOD'07): with the hash space [0, M) and
  * h_k the k-th smallest distinct hash, distinct ≈ (k−1)·M / h_k;
  * when the sketch never filled the count is exact. Set ops (theta
  * composition): θ = min of the operand thresholds, S = sketch
  * entries < θ, est = |S_a ∘ S_b| · M / θ for ∘ ∈ {∩, ∖, ∪} — all
  * integral division; the intermediate product is computed as
  * DECIMAL(38,0) (63·2^60 overflows BIGINT) and the IntegralDivide
  * result is BIGINT, mirrored by the oracle's HUGEINT `//` + BIGINT
  * cast.
  */
object KmvSketch {
  import org.apache.spark.sql.GraftShim.{column, expression}
  import org.apache.spark.sql.catalyst.expressions.IntegralDivide

  /** Hash space size: 15 hex digits = 60 bits, always positive. */
  val M: Long = 1L << 60

  /** Sketch size shared by the query-time gates and the materialized
    * serving state — the stored and direct sketches must use one k or
    * their estimates diverge. stderr ≈ 1/√(k−2) ≈ 12.7%.
    */
  val DefaultK = 64

  /** Exact integral division (SQL `div`): the Column API only exposes
    * true division, and the estimator must floor exactly like the
    * oracle's HUGEINT `//`.
    */
  private def intDiv(a: Column, b: Column): Column =
    column(IntegralDivide(expression(a), expression(b)))

  /** Deterministic 60-bit key hash — the cross-engine md5 trick.
    * Precondition: `key` must be non-null — md5(NULL) is NULL, and a
    * NULL hash fed into [[kmv]] would decode to 0L through the
    * scalaLong encoder, silently inserting a phantom entry. Filter
    * nulls (`col.isNotNull`) before sketching nullable keys.
    */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Sketch state: sorted ascending, distinct, length <= k. */
  case class Buf(hs: Array[Long])

  class KmvAgg(k: Int) extends Aggregator[Long, Buf, Array[Long]] {
    require(k > 1, s"k must be > 1, got $k")

    def zero: Buf = Buf(Array.empty)

    def reduce(b: Buf, h: Long): Buf = {
      val a = b.hs
      // saturated fast path: almost every row lands here once the
      // sketch fills (P(new min entry) = k/distinct-so-far)
      if (a.length == k && h >= a(k - 1)) return b
      val i = java.util.Arrays.binarySearch(a, h)
      if (i >= 0) return b // hash already present
      val ins = -i - 1
      val n = math.min(a.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(a, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(a, ins, out, ins + 1, n - 1 - ins)
      Buf(out)
    }

    def merge(a: Buf, b: Buf): Buf = {
      val (x, y) = (a.hs, b.hs)
      if (x.isEmpty) return b
      if (y.isEmpty) return a
      val out = new Array[Long](math.min(x.length + y.length, k))
      var (i, j, o) = (0, 0, 0)
      while (o < out.length && (i < x.length || j < y.length)) {
        val take =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) {
            if (j < y.length && x(i) == y(j)) j += 1 // dedup equal heads
            val v = x(i); i += 1; v
          } else { val v = y(j); j += 1; v }
        out(o) = take; o += 1
      }
      Buf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    def finish(b: Buf): Array[Long] = b.hs

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: `kmv(hash_col, k)` → sorted array of the k smallest
    * distinct hashes. Feed it [[keyHash]] output.
    */
  def kmv(c: Column, k: Int): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(c)

  /** Threshold θ of a sketch column: h_k when full, else M (an
    * unfilled sketch has sampled the whole hash space).
    */
  def theta(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(M)).otherwise(element_at(sk, k))

  /** Per-set distinct estimate: exact count while unfilled, else
    * (k−1)·M div h_k — DECIMAL(38,0) product, BIGINT result.
    */
  def estimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long")).otherwise(
      intDiv(lit(k - 1).cast("decimal(38,0)") * lit(M).cast("decimal(38,0)"),
        element_at(sk, k)))

  /** Sample of a sketch below a composed threshold (strictly <, so a
    * full sketch contributes its k−1 sub-threshold entries).
    */
  def sample(sk: Column, thetaCol: Column): Column =
    filter(sk, h => h < thetaCol)

  /** Scaled count → distinct estimate under threshold θ:
    * cnt · M div θ.
    */
  def scaleUp(cnt: Column, thetaCol: Column): Column =
    intDiv(cnt.cast("decimal(38,0)") * lit(M).cast("decimal(38,0)"), thetaCol)
}
