package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqSketch

/** Misra-Gries frequent-items: exactness below k, the additive error
  * bound above k, and merge-tree (partitioning) robustness.
  */
class FreqSketchSpec extends SparkSuite {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, col_ : String, k: Int): Map[String, Long] =
    df.agg(FreqSketch.freq_items(col(col_), k).as("fi"))
      .select(explode($"fi").as("x"))
      .select($"x.item", $"x.est").as[(String, Long)].collect().toMap

  test("exact when distinct <= k, under any partitioning") {
    val ev = Tables.events(spark, sfDir)
    val exact = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(sketch(ev, "event_type", 8) === exact)
    assert(sketch(ev.repartition(13), "event_type", 8) === exact)
  }

  test("approximate regime: MG bounds hold and heavy hitters survive") {
    // skewed synthetic stream: a=500, b=200, c=90, tail of 300 singletons
    val rows = Seq.fill(500)("a") ++ Seq.fill(200)("b") ++ Seq.fill(90)("c") ++
      (1 to 300).map(i => s"t$i")
    val n = rows.size
    val k = 8
    val df = rows.toDF("item").repartition(7) // force a real merge tree
    val got = sketch(df, "item", k)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // any item with true count > n/(k+1) must be present
    exact.filter(_._2 > n / (k + 1)).keys.foreach(h => assert(got.contains(h), h))
    // every estimate sits in [true - n/(k+1), true]
    got.foreach { case (item, est) =>
      val t = exact(item)
      assert(est <= t && est >= t - n / (k + 1), s"$item est=$est true=$t")
    }
    assert(got("a") > got.getOrElse("b", 0L))
  }
}
