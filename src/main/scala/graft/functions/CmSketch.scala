package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-min sketch primitives shared by the query-time sketch
  * ([[graft.queries.SketchQueries.freqCm]]) and the materialized
  * serving state ([[graft.serving.Serving]]'s `cm_daily` table): the
  * d hash rows and the deterministic per-row bucket assignment. One
  * definition — the direct sketch, the served sketch, and the DuckDB
  * oracle must bucket identically or estimates diverge.
  *
  * The sketch itself is relational: a d×w aggregated table of
  * ((hash-row i, bucket) → collision-summed count). Counts are
  * additive, so the state merges across partitions, days, and
  * refreshes as a plain SUM group-by — Spark's partial/final agg IS
  * the sketch merge.
  */
object CmSketch {

  /** Hash rows (depth d): independent estimates, MIN-combined. */
  val Depth = 4

  /** Buckets per row (width w): collision rate is ~distinct/w. */
  val Width = 512

  /** One output row per hash-row index, aliased `i` — the sketch's
    * ×d row fan-out.
    */
  def rows: Column = explode(sequence(lit(0), lit(Depth - 1))).as("i")

  /** Deterministic bucket of `key` in hash row `i` — the cross-engine
    * md5 trick ([[KmvSketch.keyHash]]), salted by the row index.
    * DuckDB mirror:
    * `('0x' || substring(md5(i || ':' || key), 1, 15))::BIGINT % Width`.
    */
  def bucket(i: Column, key: Column): Column =
    KmvSketch.keyHash(concat_ws(":", i, key)) % Width
}
