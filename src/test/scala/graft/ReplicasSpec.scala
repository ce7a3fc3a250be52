package graft

import org.apache.spark.sql.functions._
import graft.serving.{Replicas, Serving}

/** Replica-group routing: identical copies, deterministic key→replica
  * pinning, and failover when a replica disappears.
  */
class ReplicasSpec extends SparkSuite {

  private lazy val root: String = {
    val servingRoot = Serving.materialize(spark, sfDir)
    val r = java.nio.file.Files.createTempDirectory("graft_replicas").toString
    Replicas.replicate(spark, s"$servingRoot/topk_by_count", r, n = 3)
    r
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("window_start_ms"), col("rank"), col("user_id"))
      .collect().map(_.toString).toSet

  test("every replica serves the identical table") {
    val all = (0 until 3).map(i => rows(spark.read.parquet(s"$root/replica=$i")))
    assert(all.forall(_ === all.head))
    assert(all.head.nonEmpty)
  }

  test("replicas are byte-identical segment copies: same files, same bytes, layout preserved") {
    val servingRoot = Serving.materialize(spark, sfDir)
    val src = s"$servingRoot/topk_by_count"
    def manifest(dir: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten.flatMap(c =>
          if (c.isDirectory) walk(c) else Seq(c))
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath.stripPrefix(dir) -> f.length).toMap
    }
    val want = manifest(src)
    assert(want.nonEmpty)
    for (i <- 0 until 3)
      assert(manifest(s"$root/replica=$i") === want,
        s"replica $i is not a byte-identical segment copy")
    // spot-check actual bytes on the largest segment
    val biggest = want.maxBy(_._2)._1
    def bytes(p: String) = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    assert(java.util.Arrays.equals(bytes(src + biggest), bytes(s"$root/replica=1$biggest")))
  }

  test("routing is deterministic and actually spreads keys") {
    val keys = (0 until 100).map(i => s"tenant-$i")
    val routed = keys.map(Replicas.replicaFor(_, 3))
    assert(routed === keys.map(Replicas.replicaFor(_, 3)), "routing not stable")
    assert(routed.distinct.sorted === Seq(0, 1, 2), "keys all pinned to one replica")
    // the routed read reports the replica the key hashes to
    val k = keys.head
    val (df, served) = Replicas.read(spark, root, k, n = 3)
    assert(served === Replicas.replicaFor(k, 3))
    assert(rows(df).nonEmpty)
  }

  test("replica-routed gate equals the direct served lookup from any replica") {
    import spark.implicits._
    val served = graft.queries.ServingQueries.topKLookupServed(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val routed = graft.queries.ServingQueries.topKLookupReplica(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(routed === served)
    assert(routed.nonEmpty)
  }

  test("replica set re-replicates after an in-place serving refresh (freshness stamp)") {
    import spark.implicits._
    // isolated dataset copy: the shared sfDir serving root must not
    // be mutated under the other suites
    val dir = java.nio.file.Files.createTempDirectory("replica_fresh").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val before = graft.queries.ServingQueries.topKLookupReplica(spark, dir)
      .collect().map(_.toString).toSeq
    // refresh the SAME serving root with a late batch that rewrites
    // the ranked tables (new dominant user past the old anchor)
    val root = Serving.materialize(spark, dir)
    val anchor = Serving.anchorMs(spark, dir)
    val batch = (1 to 5).map(i =>
        (new java.sql.Timestamp(anchor + i * 60000L), 999999L, "click", 100L))
      .toDF("ts", "user_id", "event_type", "value_cents")
    Serving.refreshWithBatch(spark, root, batch, batchId = 0L)
    val served = graft.queries.ServingQueries.topKLookupServed(spark, dir)
      .collect().map(_.toString).toSeq
    val routed = graft.queries.ServingQueries.topKLookupReplica(spark, dir)
      .collect().map(_.toString).toSeq
    assert(routed === served, "stale replica served after refresh")
    assert(routed !== before, "refresh should have changed the lookup window")
  }

  test("erasure propagates through replication: no replica serves the erased user") {
    import spark.implicits._
    // isolated dataset copy: the erase mutates the serving root
    val dir = java.nio.file.Files.createTempDirectory("replica_erase").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    // victim: a user visible in the replica-routed lookup, chosen so
    // it does NOT own the global max ts — the erase then changes
    // neither max_ts_ms nor last_batch_id, and only the erase
    // generation can tell the replica set the content moved
    val ev = Tables.events(spark, dir)
    val lastUser = ev.orderBy(col("ts").desc).select(col("user_id"))
      .head().getLong(0)
    val victim = graft.queries.ServingQueries.topKLookupReplica(spark, dir)
      .select(col("user_id")).as[Long].collect()
      .find(_ != lastUser).get
    val root = Serving.materialize(spark, dir)
    Serving.eraseUser(spark, root, ev, victim)
    // the routed lookup re-derives and equals the direct served read
    val servedRows = graft.queries.ServingQueries.topKLookupServed(spark, dir)
      .collect().map(_.toString).toSeq
    val routedRows = graft.queries.ServingQueries.topKLookupReplica(spark, dir)
      .collect().map(_.toString).toSeq
    assert(routedRows === servedRows, "stale replica served after erase")
    // and EVERY replica of the ranked table is clean — route a tenant
    // to each replica and scan its whole copy, not just the window
    for (i <- 0 until 3) {
      val tenant = (0 until 100).map(j => s"tenant-$j")
        .find(Replicas.replicaFor(_, 3) == i).get
      val full = graft.serving.ReplicaRouter.table(
        spark, dir, "topk_by_count", tenant)
      assert(full.filter(col("user_id") === victim).isEmpty,
        s"replica $i still serves the erased user")
    }
  }

  test("a partial replica — crashed or in-flight rebuild — fails over, never serves silently") {
    val servingRoot = Serving.materialize(spark, sfDir)
    val r = java.nio.file.Files.createTempDirectory("graft_replicas_part").toString
    Replicas.replicate(spark, s"$servingRoot/topk_by_count", r, n = 3)
    // publish staged atomically: no stage debris, a manifest in every copy
    assert(!new java.io.File(s"$r/_stage").exists)
    for (i <- 0 until 3)
      assert(new java.io.File(s"$r/replica=$i/_replica_manifest").exists)
    def tenantOn(i: Int): String = (0 until 100).map(j => s"tenant-$j")
      .find(Replicas.replicaFor(_, 3) == i).get
    val want = rows(spark.read.parquet(s"$r/replica=2"))
    assert(want.nonEmpty)
    // crashed rebuild: replica 0 lost a segment its manifest records
    def segs(i: Int): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten.flatMap(c =>
          if (c.isDirectory) walk(c) else Seq(c))
      walk(new java.io.File(s"$r/replica=$i"))
        .filter(_.getName.endsWith(".parquet"))
    }
    assert(segs(0).head.delete())
    val (df0, served0) = Replicas.read(spark, r, tenantOn(0), n = 3)
    assert(served0 === 1, "partial replica 0 must fail over to 1")
    assert(rows(df0) === want)
    // in-flight rebuild: replica 1 has files but no manifest yet
    assert(new java.io.File(s"$r/replica=1/_replica_manifest").delete())
    val (df1, served1) = Replicas.read(spark, r, tenantOn(1), n = 3)
    assert(served1 === 2, "manifest-less replica 1 must fail over to 2")
    assert(rows(df1) === want)
    // and re-replication heals both: every copy serves again
    Replicas.replicate(spark, s"$servingRoot/topk_by_count", r, n = 3)
    for (i <- 0 until 3)
      assert(Replicas.read(spark, r, tenantOn(i), n = 3)._2 === i)
  }

  test("a lost replica fails over with identical results") {
    val k = (0 until 100).map(i => s"tenant-$i")
      .find(Replicas.replicaFor(_, 3) == 1).get
    val before = rows(Replicas.read(spark, root, k, n = 3)._1)
    val victim = new org.apache.hadoop.fs.Path(s"$root/replica=1")
    val fs = victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(victim, true)
    val (df, served) = Replicas.read(spark, root, k, n = 3)
    assert(served === 2, "failover must move to the next replica")
    assert(rows(df) === before, "failover changed the served result")
  }
}
