package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingFunnel

/** Streaming funnel ≡ batch funnel: state is order-insensitive
  * min-merge, so any batch split of the same events converges to the
  * batch answer; idle users are evicted under the event-time TTL.
  */
class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val events = Seq(
    // user 1: full ordered funnel
    Ev(1, ts(0), 1, "signup", 0), Ev(2, ts(1), 1, "view", 0),
    Ev(3, ts(2), 1, "click", 0), Ev(4, ts(3), 1, "purchase", 0),
    // user 2: view arrives FIRST (out of order vs signup)
    Ev(5, ts(0), 2, "view", 0), Ev(6, ts(1), 2, "signup", 0),
    // user 3: signup only
    Ev(7, ts(5), 3, "signup", 0))

  test("any batch split converges to the batch funnel stages") {
    for (splitAt <- Seq(0, 3, 5)) {
      implicit val sql = spark.sqlContext
      val mem = MemoryStream[Ev]
      val updates = StreamingFunnel.stageUpdates(spark, mem.toDF())
      val last = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val q = updates.writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingFunnel.UserStage], _: Long) =>
          batch.collect().foreach(u => last.put(u.user_id, u.max_stage))
        }.start()
      try {
        val (a, b) = events.splitAt(splitAt)
        if (a.nonEmpty) { mem.addData(a: _*); q.processAllAvailable() }
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
        val batchStages = graft.queries.AnalyticsQueries
          .funnelOf(spark, events.toDF().select($"user_id", $"event_type", $"ts"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // streaming emits per-user stages; fold to the cumulative counts
        import scala.jdk.CollectionConverters._
        val stages = last.asScala.values.toSeq
        val streamed = (0L to 4L).map(s => s -> stages.count(_ >= s).toLong).toMap
        assert(streamed === batchStages, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("idle users are evicted under the event-time TTL") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val withWm = mem.toDF().withWatermark("ts", "0 seconds")
    val updates = StreamingFunnel.stageUpdates(spark, withWm,
      idleTtlMs = Some(60L * 1000L)) // 1 minute of event time
    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("funnel_ttl").start()
    try {
      // b1: user 1 signs up; watermark after the batch = 10:00
      mem.addData(Ev(1, ts(0), 1, "signup", 0))
      q.processAllAvailable()
      // b2: advances the watermark to 10:30 (> user 1's 10:01 timer)
      mem.addData(Ev(2, ts(30), 2, "signup", 0))
      q.processAllAvailable()
      // b3: user 1 has NO data here → its expired timer fires, state
      // evicted (groups with data are never handed their timeout)
      mem.addData(Ev(3, ts(40), 2, "view", 0))
      q.processAllAvailable()
      // b4: user 1 returns with a view ONLY — a surviving state
      // (signup 10:00 < view 10:41) would emit stage 2; a fresh one
      // emits stage 0
      mem.addData(Ev(4, ts(41), 1, "view", 0))
      q.processAllAvailable()
      val rows = spark.table("funnel_ttl")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val u1 = rows.filter(_._1 == 1L).map(_._2).sorted
      assert(u1 === Seq(0L, 1L),
        s"user 1 should re-enter at stage 0 after eviction, got $u1")
      assert(rows.filter(_._1 == 2L).map(_._2).max === 2L)
    } finally q.stop()
  }
}
