package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.GapAlert

/** Absence detection: closed-gap alerts must equal the batch
  * lag-pair recompute under ANY batch split (the StreamingFunnel
  * parity discipline), and the event-time timer must raise an open
  * alert while a key is still silent.
  */
class GapAlertSpec extends SparkSuite {
  import spark.implicits._

  private val gapMs = 60000L // 1 minute

  private def ev(key: String, t: String) = GapAlert.Ev(Timestamp.valueOf(t), key)

  // key a: gaps 09:00→09:05 (closed) and 09:05→silence (open);
  // key b: steady heartbeats, one in-batch gap 09:01→09:03
  private val feed = Seq(
    ev("a", "2024-01-01 09:00:00"), ev("b", "2024-01-01 09:00:00"),
    ev("b", "2024-01-01 09:00:30"), ev("b", "2024-01-01 09:01:00"),
    ev("b", "2024-01-01 09:03:00"), ev("a", "2024-01-01 09:05:00"),
    ev("b", "2024-01-01 09:03:30"), ev("b", "2024-01-01 09:04:00"))

  private def runSplits(splits: Seq[Seq[GapAlert.Ev]],
      idleTtlMs: Long = -1L): Seq[GapAlert.Alert] = {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[GapAlert.Ev]
    val alerts = GapAlert.alerts(spark,
      mem.toDS().withWatermark("ts", "1 second").as[GapAlert.Ev], gapMs, idleTtlMs)
    val name = s"gap_alerts_${System.nanoTime()}"
    val q = alerts.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      splits.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).as[GapAlert.Alert].collect().toSeq
    } finally q.stop()
  }

  test("closed-gap alerts equal the batch lag recompute under any batch split") {
    val expected = feed.groupBy(_.key).flatMap { case (k, evs) =>
      evs.map(_.ts.getTime).sorted.sliding(2).collect {
        case Seq(a, b) if b - a > gapMs => GapAlert.Alert(k, "closed", a, b, b - a)
      }
    }.toSet
    val splits = Seq(
      Seq(feed),                       // one batch
      feed.map(Seq(_)),                // one event per batch
      Seq(feed.take(3), feed.slice(3, 6), feed.drop(6))) // ragged
    splits.foreach { s =>
      val closed = runSplits(s).filter(_.kind == "closed").toSet
      assert(closed === expected, s"split sizes ${s.map(_.size)}")
    }
  }

  test("open alert fires while the key is silent, once per episode") {
    // key a stops at 09:00; key b's heartbeats push the watermark
    // past a's timer (09:01) -> exactly one open alert for a
    val got = runSplits(Seq(
      Seq(ev("a", "2024-01-01 09:00:00"), ev("b", "2024-01-01 09:00:00")),
      Seq(ev("b", "2024-01-01 09:00:50")),
      Seq(ev("b", "2024-01-01 09:01:40")),
      Seq(ev("b", "2024-01-01 09:02:30")),
      Seq(ev("b", "2024-01-01 09:03:20"))))
    val opens = got.filter(a => a.kind == "open" && a.key == "a")
    assert(opens === Seq(GapAlert.Alert("a", "open",
      Timestamp.valueOf("2024-01-01 09:00:00").getTime, -1L, -1L)))
    // b never went silent past the threshold
    assert(!got.exists(a => a.key == "b" && a.kind == "open"))
    // when a returns, the episode closes with exact bounds
    val got2 = runSplits(Seq(
      Seq(ev("a", "2024-01-01 09:00:00"), ev("b", "2024-01-01 09:00:00")),
      Seq(ev("b", "2024-01-01 09:02:00")),
      Seq(ev("a", "2024-01-01 09:04:00"))))
    val aAlerts = got2.filter(_.key == "a")
    assert(aAlerts.map(_.kind).sorted === Seq("closed", "open"))
    val closed = aAlerts.find(_.kind == "closed").get
    assert(closed.gap_ms === 240000L)
  }

  test("idle keys evict after the TTL and restart fresh — no spurious alerts") {
    // ttl = 2 gaps: a alerts at wm>09:01, evicts at wm>09:03
    // (lastSeen 09:00 + gap 60 s + ttl 120 s), returns at 09:10 to a
    // FRESH slate — the swept episode yields no closed alert and no
    // extra open; the key then still works: its NEXT silence opens a
    // new episode.
    val got = runSplits(Seq(
      Seq(ev("a", "2024-01-01 09:00:00"), ev("b", "2024-01-01 09:00:00")),
      Seq(ev("b", "2024-01-01 09:01:30")), // fires a's open alert
      Seq(ev("b", "2024-01-01 09:03:30")), // fires a's eviction sweep
      Seq(ev("a", "2024-01-01 09:10:00")), // returns after the sweep
      Seq(ev("b", "2024-01-01 09:10:30")), // wm below a's new timer
      Seq(ev("b", "2024-01-01 09:12:00"))), // wm past 09:11 -> new open
      idleTtlMs = 120000L)
    val a = got.filter(_.key == "a")
    assert(a.count(_.kind == "closed") === 0,
      s"swept episode must not emit a closed alert: $a")
    val opens = a.filter(_.kind == "open").sortBy(_.gap_start_ms)
    assert(opens.map(_.gap_start_ms) === Seq(
      Timestamp.valueOf("2024-01-01 09:00:00").getTime,
      Timestamp.valueOf("2024-01-01 09:10:00").getTime), s"opens: $opens")
  }

  test("idleTtl <= gap still delivers the closed alert when the key returns in time") {
    // eviction is idleTtl after the OPEN ALERT (lastSeen+gap+ttl =
    // 09:01:30), not idleTtl after lastSeen (09:00:30, which the
    // watermark passed before the open alert even fired — the old
    // math would sweep the key on the next tick and forfeit the
    // closed alert unconditionally for any ttl <= gap)
    val got = runSplits(Seq(
      Seq(ev("a", "2024-01-01 09:00:00"), ev("b", "2024-01-01 09:00:00")),
      Seq(ev("b", "2024-01-01 09:01:15")), // wm>09:01 fires a's open
      Seq(ev("a", "2024-01-01 09:05:00"))), // returns before eviction
      idleTtlMs = 30000L)
    val a = got.filter(_.key == "a")
    assert(a.map(_.kind).sorted === Seq("closed", "open"), s"alerts: $a")
    assert(a.find(_.kind == "closed").get.gap_ms === 300000L)
  }
}
