package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, ServingQueries}
import graft.serving.Serving

/** The materialized serving path: built tables are reused across
  * calls, the count-path lookup matches the recompute-from-raw
  * formulation, and the revenue path obeys its ordering contract.
  */
class ServingSpec extends SparkSuite {
  import spark.implicits._

  test("count-path served lookup equals recompute-from-events lookup") {
    val served = ServingQueries.topKLookupServed(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val recomputed = EventQueries.topKLookup(spark, sfDir)
      .select("window_start_ms", "rank", "user_id", "order_count", "total_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(served.nonEmpty)
    assert(served === recomputed)
  }

  test("revenue lookup: 10 rows, revenue-desc then window-desc order") {
    val rows = ServingQueries.topKLookupRevenue(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.length === 10)
    val key = rows.map { case (_, we, uid, _, cents) => (-cents, -we, uid) }
    assert(key === key.sorted)
  }

  test("materialize is idempotent: second call rebuilds nothing") {
    val root = Serving.materialize(spark, sfDir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m0 = fs.getFileStatus(new Path(s"$root/topk_by_count/_SUCCESS")).getModificationTime
    Serving.materialize(spark, sfDir)
    val m1 = fs.getFileStatus(new Path(s"$root/topk_by_count/_SUCCESS")).getModificationTime
    assert(m0 === m1)
  }
}
