package graft

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{ContinuousTopK, Generator, StreamingPipeline}

/** Counter tick for deterministic generator tests (top-level for
  * encoder reasons).
  */
case class Tick(timestamp: Timestamp, value: Long)

/** S7 generator + tally oracle, the ALL-sentinel global top-K twin,
  * and the S4 JSON sink.
  */
class GeneratorSpec extends SparkSuite {
  import spark.implicits._

  test("pipeline top-10 over the generated stream equals the generator's own tally") {
    implicit val sql = spark.sqlContext
    val latest = java.nio.file.Files.createTempDirectory("graft_gen").toString + "/latest"
    val mem = MemoryStream[Tick]
    val events = StreamingPipeline.withEventTime(
      Generator.eventsFromCounter(mem.toDF()))
    val deduped = StreamingPipeline.dedupStream(events)
    val ranked = ContinuousTopK.rank(spark,
      Generator.toGlobalUpdates(spark, deduped), k = 10)
    val q = ranked.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[ContinuousTopK.RankedItem], _: Long) =>
        if (!b.isEmpty) b.write.mode("overwrite").parquet(latest)
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      def ts(v: Long) = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((0L until 1000L).map(v => Tick(ts(v), v)))
      q.processAllAvailable()
      mem.addData((1000L until 2000L).map(v => Tick(ts(v), v)))
      q.processAllAvailable()
      val got = spark.read.parquet(latest)
        .orderBy("rank")
        .select(col("itemId").cast("long"), col("count"), col("valueCents"))
        .as[(Long, Long, Long)].collect().toSeq
      val expected = Generator.expectedTopUsers(spark, 2000L, 10)
        .select(col("user_id"), col("order_count"), col("total_cents"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === expected)
    } finally q.stop()
  }

  test("generator emits byte-identical duplicates every dupEvery ticks") {
    val ticks = (0L until 100L).map(v => Tick(Timestamp.valueOf("2024-01-01 10:00:00"), v))
    val ev = Generator.eventsFromCounter(ticks.toDS().toDF())
    assert(ev.count() === 100)
    assert(ev.select("event_id").distinct().count() === 96) // 20,40,60,80 re-emit 19,39,59,79
    val dupRows = ev.groupBy("event_id", "user_id", "event_type", "value")
      .count().filter(col("count") > 1)
    assert(dupRows.count() === 4) // payloads identical within each dup pair
  }

  test("json sink round-trips rows through to_json/from_json") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val mem = MemoryStream[Tick]
    val events = Generator.eventsFromCounter(mem.toDF())
    val q = StreamingPipeline.jsonSink(events, s"$dir/out", s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("1 second"))
    try {
      mem.addData((0L until 50L).map(v => Tick(Timestamp.valueOf("2024-01-01 10:00:00"), v)))
      q.processAllAvailable()
      val schema = events.schema
      val back = spark.read.text(s"$dir/out")
        .select(from_json(col("value"), schema).as("r")).select("r.*")
      assert(back.count() === 50)
      val a = Generator.eventsFromCounter(
        (0L until 50L).map(v => Tick(Timestamp.valueOf("2024-01-01 10:00:00"), v)).toDS().toDF())
      assert(back.orderBy("event_id", "ts").collect().toSeq ===
        a.orderBy("event_id", "ts").collect().toSeq)
    } finally q.stop()
  }

  test("rate source drives the pipeline end-to-end (smoke)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rate").toString
    val events = StreamingPipeline.withEventTime(
      Generator.eventsFromCounter(Generator.rateCounter(spark, 500)))
    val q = StreamingPipeline.dedupStream(events).writeStream
      .format("parquet")
      .option("path", s"$dir/raw")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = 0L
      while (n == 0 && System.nanoTime() < deadline) {
        Thread.sleep(500)
        n = scala.util.Try(spark.read.parquet(s"$dir/raw").count()).getOrElse(0L)
      }
      assert(n > 0, "rate-source pipeline produced no rows in 30s")
    } finally q.stop()
  }
}
