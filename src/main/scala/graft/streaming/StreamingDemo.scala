package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end demo of the streaming pipeline (EP2 shape):
  * in-memory source → watermark dedup → raw sink, 1-minute rollup
  * sink, per-window top-K sink. Prints the three resulting tables.
  *
  *   sbt "runMain graft.streaming.StreamingDemo [outDir]"
  */
object StreamingDemo {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[Ev]
    val qs = StreamingPipeline.start(spark, mem.toDF(),
      s"$dir/raw", s"$dir/rollup", s"$dir/topk", s"$dir/ckpt",
      k = 3, trigger = Trigger.ProcessingTime("1 second"))

    mem.addData(
      Ev(1, t("2024-01-01 10:00:01"), 10, "click", 1.00),
      Ev(1, t("2024-01-01 10:00:01"), 10, "click", 1.00), // duplicate
      Ev(2, t("2024-01-01 10:00:30"), 11, "view", 2.50),
      Ev(3, t("2024-01-01 10:00:45"), 12, "click", 4.00))
    qs.foreach(_.processAllAvailable())
    mem.addData(Ev(7, t("2024-01-01 10:05:00"), 12, "click", 9.00))
    qs.foreach(_.processAllAvailable())
    mem.addData(Ev(8, t("2024-01-01 10:09:00"), 13, "click", 1.00))
    qs.foreach(_.processAllAvailable())

    println("RAW (deduped) count = " + spark.read.parquet(s"$dir/raw").count())
    println("ROLLUP (per-batch segments, compacted for display):")
    graft.ops.Rollup.compactSegments(spark.read.parquet(s"$dir/rollup"))
      .drop("users_hll")
      .orderBy("window_start_ms", "event_type").show(false)
    println("TOPK (per window):")
    spark.read.parquet(s"$dir/topk")
      .orderBy("window_start_ms", "rank").show(false)
    qs.foreach(_.stop())
    spark.stop()
  }
}
