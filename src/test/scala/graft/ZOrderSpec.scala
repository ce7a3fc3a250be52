package graft

import org.apache.spark.sql.functions._
import graft.tables.TableManager

/** Z-order clustering: a user-sorted layout prunes user predicates
  * and nothing else; the Z-curve layout gives BOTH dimensions file-
  * level pruning power. Measured directly on per-file min/max extents
  * (what parquet row-group stats expose to the reader).
  */
class ZOrderSpec extends SparkSuite {

  private case class Extent(uLo: Long, uHi: Long, vLo: Long, vHi: Long)

  private def extents(path: String): Seq[Extent] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("value_cents").as("vlo"), max("value_cents").as("vhi"))
      .collect()
      .map(r => Extent(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("empty input writes an empty table instead of crashing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_z_empty").toString
    val empty = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value_cents"))
      .filter(col("event_id") < 0)
    TableManager.writeZOrdered(empty, s"$tmp/z", "user_id", "value_cents")
    assert(spark.read.parquet(s"$tmp/z").count() === 0)
  }

  test("z-order files prune a value predicate; user-sorted files cannot") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value_cents"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_z").toString

    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(s"$tmp/linear")
    TableManager.writeZOrdered(ev, s"$tmp/zorder", "user_id", "value_cents",
      bits = 16, nFiles = 16)

    // round-trip: clustering must not lose or duplicate rows
    val orig = ev.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val back = spark.read.parquet(s"$tmp/zorder")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(back === orig)

    val Seq(vMin, vMax) = ev.agg(min("value_cents"), max("value_cents"))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1))).head
    // a 10%-wide band on value_cents — the dimension the linear
    // layout does NOT sort by
    val bandLo = vMin + (vMax - vMin) * 45 / 100
    val bandHi = vMin + (vMax - vMin) * 55 / 100
    def touching(es: Seq[Extent]) =
      es.count(e => e.vLo <= bandHi && e.vHi >= bandLo)

    val lin = extents(s"$tmp/linear")
    val zo = extents(s"$tmp/zorder")
    val (linTouch, zTouch) = (touching(lin), touching(zo))
    // user-sorted files each span ~the full value range: no pruning
    assert(linTouch >= lin.size - 1,
      s"expected the linear layout to have ~zero value-pruning power, " +
        s"but only $linTouch/${lin.size} files touch the band")
    // z-ordered files have compact value extents: most files skippable
    assert(zTouch < linTouch, s"z=$zTouch lin=$linTouch")
    assert(zTouch <= zo.size / 2,
      s"z-order should skip at least half the files on a 10% band, " +
        s"touched $zTouch/${zo.size}")

    // and the z layout still retains user-dimension pruning power
    val uBandLo = 0L
    val uBandHi = ev.agg(max("user_id")).head().getLong(0) / 4
    val zUserTouch = zo.count(e => e.uLo <= uBandHi && e.uHi >= uBandLo)
    assert(zUserTouch <= zo.size * 3 / 4,
      s"z-order lost user-pruning power: $zUserTouch/${zo.size} files " +
        s"touch a quarter-range user band")
  }
}
