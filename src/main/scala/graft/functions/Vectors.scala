package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding
  * columns. All math is done in double precision with left-to-right
  * accumulation (index order) so results are bit-reproducible and
  * comparable across engines. Pure expressions — no UDFs — so they
  * stay inside whole-stage codegen.
  */
object Vectors {

  /** Cast array<float> → array<double> (compute precision). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product, sequential accumulation in index order. Delegates
    * to the codegen'd [[VecDot]] kernel (bit-identical to the
    * interpreted `aggregate(zip_with(...))` formulation, ~10× faster
    * on wide fan-outs).
    */
  def dot(a: Column, b: Column): Column = VecExprs.vec_dot(a, b)

  /** Squared L2 norm. */
  def norm2(v: Column): Column = dot(v, v)

  def norm(v: Column): Column = sqrt(norm2(v))

  /** Cosine similarity = dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x))

  /** Coarse IVF cell assignment: index of the nearest centroid by
    * cosine (centroids as a literal array-of-arrays column, broadcast
    * by value inside the expression). Deterministic tie-break: lowest
    * index wins.
    */
  def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cc = array(c.map(lit(_)): _*)
      struct(cosine(v, cc).as("sim"), lit(-i).as("negidx"))
    }
    // argmax by (sim, then lowest idx): structs compare
    // lexicographically, so greatest() picks max sim with (on ties)
    // max negidx = min idx — O(n) per row, no array materialize/sort.
    -greatest(scored: _*).getField("negidx")
  }
}
