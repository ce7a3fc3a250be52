package graft

import graft.serving.Lease

/** The single-writer lease ([[graft.serving.Lease]]) every serving
  * write path (refresh / erase / EraseStage / maintenance) acquires:
  * concurrent writers are refused or serialized, a crashed holder's
  * stale lease is taken over, nested acquires are reentrant, and a
  * holder that lost its lease never deletes the new owner's file.
  */
class LeaseSpec extends SparkSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lease").toString

  private def leaseFile(root: String) = new java.io.File(s"$root/_lease")

  private def writeForeign(root: String, owner: String, heartbeat: Long): Unit = {
    val w = new java.io.FileWriter(leaseFile(root))
    try w.write(s"$owner\tforeign-nonce\t$heartbeat") finally w.close()
  }

  test("acquire/release round-trip: file exists while held, gone after") {
    val r = tmp()
    Lease.acquire(spark, r, "t1")
    assert(leaseFile(r).exists())
    val content = scala.io.Source.fromFile(leaseFile(r)).mkString
    assert(content.startsWith("t1@"), s"owner missing from lease: $content")
    Lease.release(spark, r)
    assert(!leaseFile(r).exists())
  }

  test("a live foreign lease refuses a second writer within waitMs") {
    val r = tmp()
    writeForeign(r, "other-process", System.currentTimeMillis())
    assert(Lease.heldByOther(spark, r))
    val e = intercept[Lease.LeaseHeldException] {
      Lease.acquire(spark, r, "t2", waitMs = 400)
    }
    assert(e.getMessage.contains("other-process"))
    // the refused writer left the foreign lease in place
    assert(scala.io.Source.fromFile(leaseFile(r)).mkString
      .contains("other-process"))
  }

  test("a crashed holder's stale lease is taken over") {
    val r = tmp()
    writeForeign(r, "crashed-process",
      System.currentTimeMillis() - 60 * 60 * 1000L)
    // stale => not "held" for readers, and a new writer takes over
    assert(!Lease.heldByOther(spark, r))
    Lease.acquire(spark, r, "taker", waitMs = 2000)
    val content = scala.io.Source.fromFile(leaseFile(r)).mkString
    assert(content.startsWith("taker@"), s"takeover did not rewrite: $content")
    // no takeover tombstones survive
    assert(new java.io.File(r).listFiles().map(_.getName)
      .count(_.startsWith("_lease")) === 1)
    Lease.release(spark, r)
    assert(!leaseFile(r).exists())
  }

  test("nested acquires are reentrant; the outermost release deletes") {
    val r = tmp()
    Lease.withLease(spark, r, "outer") {
      Lease.withLease(spark, r, "inner") {
        assert(leaseFile(r).exists())
      }
      // inner release must NOT drop the file while outer still holds
      assert(leaseFile(r).exists())
    }
    assert(!leaseFile(r).exists())
  }

  test("renew re-stamps the heartbeat in per-nonce sidecars; the lease file is immutable") {
    val r = tmp()
    Lease.acquire(spark, r, "t3")
    val before = scala.io.Source.fromFile(leaseFile(r)).mkString
    val nonce = before.split("\t")(1)
    def hbStamps: Seq[Long] = (0 to 1).flatMap { k =>
      val f = new java.io.File(s"$r/_lease.hb.$nonce.$k")
      if (!f.exists()) Nil
      else scala.io.Source.fromFile(f).mkString.trim.toLongOption.toSeq
    }
    Thread.sleep(20)
    Lease.renew(spark, r)
    // the heartbeat goes to sidecars keyed by OUR nonce — the shared
    // lease file is byte-identical, which is the structural property
    // that makes a renew racing a TTL takeover unable to clobber the
    // new owner's lease
    assert(scala.io.Source.fromFile(leaseFile(r)).mkString === before,
      "renew rewrote the shared lease file")
    val hb1 = hbStamps
    assert(hb1.nonEmpty)
    Thread.sleep(20)
    Lease.renew(spark, r)
    val hb2 = hbStamps
    assert(hb2.max > hb1.max, "heartbeat must advance")
    // double-buffered: the second renew wrote the OTHER buffer, so
    // the previous completed stamp stayed readable throughout
    assert(hb2.size === 2, s"expected both buffers after two renews: $hb2")
    Lease.release(spark, r)
    assert(hbStamps.isEmpty, "release left heartbeat sidecars")
    assert(!leaseFile(r).exists())
  }

  test("a stale holder that renewed recently is LIVE: staleness uses the sidecar heartbeat") {
    val r = tmp()
    // lease created long ago (stale by the created stamp alone)...
    val old = System.currentTimeMillis() - 60 * 60 * 1000L
    val w = new java.io.FileWriter(leaseFile(r))
    try w.write(s"slow-holder\tfn-1\t$old") finally w.close()
    // ...but its sidecar heartbeat is fresh → still held
    val hb = new java.io.FileWriter(s"$r/_lease.hb.fn-1.0")
    try hb.write(System.currentTimeMillis().toString) finally hb.close()
    assert(Lease.heldByOther(spark, r))
    intercept[Lease.LeaseHeldException] {
      Lease.acquire(spark, r, "taker", waitMs = 400)
    }
    // heartbeat goes stale → takeover succeeds and sweeps the sidecar
    val hb2 = new java.io.FileWriter(s"$r/_lease.hb.fn-1.0")
    try hb2.write(old.toString) finally hb2.close()
    assert(!Lease.heldByOther(spark, r))
    Lease.acquire(spark, r, "taker", waitMs = 2000)
    assert(!new java.io.File(s"$r/_lease.hb.fn-1.0").exists(),
      "takeover left the dead holder's heartbeat sidecar")
    Lease.release(spark, r)
  }


  test("a displaced holder does not delete the new owner's lease") {
    val r = tmp()
    Lease.acquire(spark, r, "t4")
    // simulate a (mis-tuned TTL) takeover while we still think we hold
    writeForeign(r, "new-owner", System.currentTimeMillis())
    Lease.release(spark, r) // must be a no-op on the file
    assert(scala.io.Source.fromFile(leaseFile(r)).mkString
      .contains("new-owner"))
    leaseFile(r).delete()
  }

  test("serving read barrier: a fresh table read refuses a live foreign writer, passes after release and under our own lease") {
    import graft.serving.Serving
    // isolated dataset: this root's table cache must be cold
    val dir = java.nio.file.Files.createTempDirectory("graft_lease_rb").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val root = Serving.materialize(spark, dir)
    writeForeign(root, "other-writer", System.currentTimeMillis())
    spark.conf.set("graft.read.barrier.ms", "400")
    try {
      // a read racing a live foreign writer is REFUSED, never a mix
      intercept[Lease.LeaseHeldException] {
        Serving.readTable(spark, dir, "topk_by_count").collect()
      }
      // writer released: the same read pins one complete generation
      assert(leaseFile(root).delete())
      assert(Serving.readTable(spark, dir, "topk_by_count").collect().nonEmpty)
      // a writer's OWN queries never self-block mid-write
      Lease.withLease(spark, root, "self") {
        assert(Serving.readTable(spark, dir, "rollup_1m").collect().nonEmpty)
      }
    } finally spark.conf.unset("graft.read.barrier.ms")
  }

  test("a displaced writer's staged apply aborts before touching live directories") {
    import spark.implicits._
    import graft.serving.EraseStage
    val r = tmp()
    // one-partition table the zombie's staged swap would rewrite
    Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "p")
      .write.partitionBy("p").parquet(s"$r/t")
    val part = new java.io.File(s"$r/t/p=2024-01-01")
    val partFiles = part.list().toSet

    // -- the zombie stages its erase normally, manifest committed --
    Lease.acquire(spark, r, "zombie")
    val kept = Seq((9L, "2024-01-01")).toDF("id", "p")
    EraseStage.stage(spark, r,
      Seq(EraseStage.Swap("t", "p", Seq("2024-01-01")) -> kept))
    // -- paused past its TTL, another process takes the lease over --
    writeForeign(r, "new-owner", System.currentTimeMillis())
    // -- the zombie resumes: the apply must abort at the fence,
    //    BEFORE deleting the affected partition directory --
    val e = intercept[Lease.LeaseHeldException] { EraseStage.recover(spark, r) }
    assert(e.getMessage.contains("lost before renew"), e.getMessage)
    assert(part.list().toSet === partFiles, "zombie apply touched data")
    // the committed manifest survives for the NEW owner's recovery
    assert(new java.io.File(s"$r/_erase_stage/_manifest").exists())
    Lease.release(spark, r) // no-op on the new owner's file
    assert(scala.io.Source.fromFile(leaseFile(r)).mkString.contains("new-owner"))

    // -- same fence at STAGE time: a zombie must not delete the new
    //    owner's stage directory as "debris" --
    leaseFile(r).delete()
    Lease.acquire(spark, r, "zombie2")
    writeForeign(r, "new-owner-2", System.currentTimeMillis())
    intercept[Lease.LeaseHeldException] {
      EraseStage.stage(spark, r,
        Seq(EraseStage.Swap("t", "p", Seq("2024-01-02")) -> kept))
    }
    assert(new java.io.File(s"$r/_erase_stage/_manifest").exists(),
      "zombie stage deleted the in-flight stage directory")
    Lease.release(spark, r)

    // -- and the new owner CAN complete the original erase --
    leaseFile(r).delete()
    assert(EraseStage.recover(spark, r))
    val after = spark.read.parquet(s"$r/t")
      .select($"id", $"p".cast("string")).as[(Long, String)].collect().toSet
    assert(after === Set((9L, "2024-01-01"), (2L, "2024-01-02")))
  }

  test("same-JVM threads serialize: the critical section never overlaps") {
    val r = tmp()
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { i =>
      new Thread(() => Lease.withLease(spark, r, s"w$i") {
        val now = inside.incrementAndGet()
        maxSeen.getAndUpdate(m => math.max(m, now))
        Thread.sleep(50)
        inside.decrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(maxSeen.get() === 1, "two writers overlapped inside the lease")
    assert(!leaseFile(r).exists())
  }
}
