package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** W8: streaming metrics reporting — the reference's scheduled
  * metrics thread (KafkaConsumerTopKJob.kt:327-335 logs processed /
  * deduped / emitted counts every 30 s). Spark's idiom is a
  * `StreamingQueryListener`: progress events already carry rows/s and
  * batch durations, so the listener just accumulates and exposes
  * them; no side thread, no driver polling of executors.
  */
object Metrics {

  final case class QueryStats(
      batches: Long,
      inputRows: Long,
      lastInputRowsPerSec: Double,
      lastBatchDurationMs: Long)

  /** Attach a stats-accumulating listener; returns a handle with a
    * live per-query snapshot map and a detach method.
    */
  def attach(spark: SparkSession): Handle = {
    val stats = new ConcurrentHashMap[String, QueryStats]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val name = Option(p.name).getOrElse(p.id.toString)
        stats.compute(name, (_, prev) => {
          val base = Option(prev).getOrElse(QueryStats(0, 0, 0.0, 0))
          QueryStats(
            batches = base.batches + 1,
            inputRows = base.inputRows + p.numInputRows,
            lastInputRowsPerSec = p.inputRowsPerSecond,
            lastBatchDurationMs = p.batchDuration)
        })
      }
    }
    spark.streams.addListener(listener)
    new Handle(spark, listener, stats)
  }

  final class Handle(
      spark: SparkSession,
      listener: StreamingQueryListener,
      stats: ConcurrentHashMap[String, QueryStats]) {
    def snapshot: Map[String, QueryStats] = {
      val b = Map.newBuilder[String, QueryStats]
      stats.forEach((k, v) => b += k -> v)
      b.result()
    }
    def detach(): Unit = spark.streams.removeListener(listener)
  }
}
