package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Rollup
import graft.streaming.TimerDedup

/** D2 timer-dedup TTL semantics and the A5 processing-time rollup. */
class StreamingVariantsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("timer dedup: suppresses within TTL, re-admits the key after expiry") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TimerDedup.Ev]
    val deduped = TimerDedup.dedup(spark,
      mem.toDS().withWatermark("ts", "10 seconds").as[TimerDedup.Ev],
      ttlMs = 60L * 1000)
    val q = deduped.writeStream.format("memory")
      .queryName("timer_dedup_out").outputMode("append").start()
    try {
      mem.addData(
        TimerDedup.Ev(1, ts("2024-01-01 10:00:01"), 10, "click", 100),
        TimerDedup.Ev(1, ts("2024-01-01 10:00:02"), 11, "click", 100), // in-batch dup
        TimerDedup.Ev(2, ts("2024-01-01 10:00:03"), 12, "view", 200))
      q.processAllAvailable()
      mem.addData(TimerDedup.Ev(1, ts("2024-01-01 10:00:30"), 13, "click", 100)) // within TTL
      q.processAllAvailable()
      // watermark far past id1's 10:01:01 timer → state cleared
      mem.addData(TimerDedup.Ev(9, ts("2024-01-01 10:20:00"), 14, "click", 100))
      q.processAllAvailable()
      mem.addData(TimerDedup.Ev(1, ts("2024-01-01 10:25:00"), 15, "click", 100)) // re-admitted
      q.processAllAvailable()
      val got = spark.table("timer_dedup_out")
        .select("event_id", "user_id").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 10L), (2L, 12L), (9L, 14L), (1L, 15L)))
    } finally q.stop()
  }

  test("processing-time rollup counts every row exactly once (update mode)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TimerDedup.Ev]
    val rolled = Rollup.rollupProcessingTime(mem.toDF(), windowDuration = "10 minutes")
    val q = rolled.writeStream.format("memory")
      .queryName("proc_rollup_out").outputMode("complete").start()
    try {
      mem.addData(
        TimerDedup.Ev(1, ts("2024-01-01 10:00:01"), 10, "click", 100),
        TimerDedup.Ev(2, ts("2024-01-01 10:00:02"), 11, "click", 250),
        TimerDedup.Ev(3, ts("2024-01-01 10:00:03"), 12, "view", 400))
      q.processAllAvailable()
      val out = spark.table("proc_rollup_out")
        .groupBy("event_type").agg(sum("order_count").as("n"), sum("sum_value_cents").as("c"))
        .as[(String, Long, Long)].collect().toMap2
      assert(out === Map("click" -> (2L, 350L), "view" -> (1L, 400L)))
      // windows are wall-clock: starts must align to the 10-min grid
      spark.table("proc_rollup_out").select("window_start_ms").as[Long].collect()
        .foreach(w => assert(w % (10L * 60 * 1000) === 0))
    } finally q.stop()
  }

  test("metrics listener accumulates batch counts and input rows") {
    implicit val sql = spark.sqlContext
    val handle = graft.streaming.Metrics.attach(spark)
    val mem = MemoryStream[TimerDedup.Ev]
    val q = mem.toDF().writeStream.format("memory")
      .queryName("metrics_probe").outputMode("append").start()
    try {
      mem.addData(TimerDedup.Ev(1, ts("2024-01-01 10:00:01"), 10, "click", 100))
      q.processAllAvailable()
      mem.addData(
        TimerDedup.Ev(2, ts("2024-01-01 10:00:02"), 11, "view", 200),
        TimerDedup.Ev(3, ts("2024-01-01 10:00:03"), 12, "view", 300))
      q.processAllAvailable()
      // listener events are delivered asynchronously — poll briefly
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var st = handle.snapshot.get("metrics_probe")
      while (st.forall(_.inputRows < 3) && System.nanoTime() < deadline) {
        Thread.sleep(100); st = handle.snapshot.get("metrics_probe")
      }
      assert(st.exists(_.inputRows === 3L), st.toString)
      assert(st.exists(_.batches >= 2L), st.toString)
    } finally { q.stop(); handle.detach() }
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(t => (t._1, (t._2, t._3))).toMap
  }
}
