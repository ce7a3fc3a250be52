package graft

import org.apache.spark.sql.functions._
import graft.functions.BitmapDistinct

/** Exact bitmap distinct ([[graft.functions.BitmapDistinct]]):
  * exactness, partitioning-invariant state, exact OR re-merge
  * (including idempotence under duplicate grains), page-boundary and
  * negative-id handling — the properties that let the bitmap gates
  * hash-check plain COUNT(DISTINCT) with no tolerance band.
  */
class BitmapSpec extends SparkSuite {
  import spark.implicits._

  private def card(ids: Seq[Long], parts: Int): Long =
    ids.toDF("id").repartition(parts)
      .agg(BitmapDistinct.bitmap(col("id")).as("bm"))
      .select(BitmapDistinct.cardinality($"bm")).as[Long].head()

  test("bitmap: exact distinct regardless of duplication and partitioning") {
    val ids = (1L to 1000L) ++ (1L to 1000L) ++ (500L to 1500L)
    assert(card(ids, 1) == 1500L)
    assert(card(ids, 13) == 1500L)
  }

  test("bitmap: page boundaries, sparse pages, and negative ids") {
    val pb = BitmapDistinct.PageBits.toLong
    // ids straddling page edges, a far-away sparse page, and negatives
    val ids = Seq(0L, pb - 1, pb, pb + 1, 7 * pb, 1000000L * pb,
      -1L, -pb, -pb - 1)
    assert(card(ids ++ ids, 3) == ids.distinct.size.toLong)
  }

  test("bitmap: state is partitioning-invariant (bit-identical merge tree)") {
    def state(parts: Int) =
      (1L to 5000L).toDF("id").repartition(parts)
        .agg(BitmapDistinct.bitmap(col("id")).as("bm"))
        .select($"bm.pages", $"bm.words").as[(Seq[Long], Seq[Long])].head()
    assert(state(1) == state(17))
  }

  test("bitmap: grain re-merge is exact and idempotent") {
    // build per-group grains, merge back — equals direct; merging a
    // grain twice changes nothing (OR idempotence)
    val df = (1L to 3000L).map(i => (i % 7, i % 1100)).toDF("g", "id")
    val grains = df.groupBy($"g").agg(BitmapDistinct.bitmap($"id").as("bm"))
    val merged = grains
      .agg(BitmapDistinct.bitmapMerge($"bm").as("bm"))
      .select(BitmapDistinct.cardinality($"bm")).as[Long].head()
    assert(merged == 1100L)
    val doubled = grains.unionAll(grains)
      .agg(BitmapDistinct.bitmapMerge($"bm").as("bm"))
      .select(BitmapDistinct.cardinality($"bm")).as[Long].head()
    assert(doubled == 1100L)
  }

  test("bitmap: pure-SQL surface == Column API, row for row") {
    val api = graft.queries.SketchQueries.distinctBitmap(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sql = graft.queries.SqlQueries.distinctBitmapSql(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(api == sql && api.nonEmpty)
  }

  test("bitmap: empty input and cardinality of the empty state") {
    val empty = Seq.empty[Long].toDF("id")
      .agg(BitmapDistinct.bitmap(col("id")).as("bm"))
      .select(BitmapDistinct.cardinality($"bm")).as[Long].head()
    assert(empty == 0L)
  }
}
