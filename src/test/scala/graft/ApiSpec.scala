package graft

import org.apache.spark.sql.functions._
import graft.api.TopKApi
import graft.serving.Serving

/** TopKApi façade contract: defaults, sentinel routing, k bounds. */
class ApiSpec extends SparkSuite {
  import spark.implicits._

  test("defaults: now-1h..now windows only, k=10, global sentinel rows") {
    val now = Serving.anchorMs(spark, sfDir)
    val rows = TopKApi.topk(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("restaurant_id") === "all")
      val ws = r.getAs[Long]("window_start_ms")
      assert(ws < now && ws + Serving.hourMs > now - Serving.hourMs)
      assert(r.getAs[Long]("rank") <= 10)
    }
  }

  test("\"all\" sentinel is case-insensitive") {
    val a = TopKApi.topk(spark, sfDir, restaurantId = "all").collect().toSeq
    val b = TopKApi.topk(spark, sfDir, restaurantId = "ALL").collect().toSeq
    assert(a === b)
  }

  test("restaurant routing filters the keyed table to that restaurant") {
    val now = Serving.anchorMs(spark, sfDir)
    val rows = TopKApi.topk(spark, sfDir, restaurantId = "click",
      fromMs = Some(now - 24 * Serving.hourMs), k = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("restaurant_id") === "click")
      assert(r.getAs[Long]("rank") <= 3)
    }
  }

  test("byRevenue returns a flat k-row list in revenue-desc order") {
    val now = Serving.anchorMs(spark, sfDir)
    val rows = TopKApi.topk(spark, sfDir,
      fromMs = Some(now - 72 * Serving.hourMs), k = 5, byRevenue = true)
      .select("total_cents", "window_end_ms").as[(Long, Long)].collect().toSeq
    assert(rows.length === 5)
    val key = rows.map { case (c, w) => (-c, -w) }
    assert(key === key.sorted)
  }

  test("k outside [1, K] is rejected") {
    intercept[IllegalArgumentException] { TopKApi.topk(spark, sfDir, k = 0) }
    intercept[IllegalArgumentException] { TopKApi.topk(spark, sfDir, k = Serving.K + 1) }
  }
}
