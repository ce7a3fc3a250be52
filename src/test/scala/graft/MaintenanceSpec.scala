package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.ops.Ann
import graft.serving.{AnnIndex, EraseStage, Maintenance, SearchIndex}
import graft.streaming.MediaIngest
import graft.tables.TableManager

/** The single scheduled-maintenance entry point
  * ([[graft.serving.Maintenance]]): one tick over a fleet holding
  * staged-commit debris, an expired retention date, and several
  * fragmented roots must leave everything clean — and a second tick
  * must be a no-op (nothing recovered, swept, or compacted), which is
  * what makes it safe to run on a schedule.
  */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("one tick: debris recovered + expired dates swept + fragmented roots compacted; second tick no-op") {
    // --- a dated raw table: expired date, fragmented date, and a
    //     committed-but-unapplied staged erase
    val t = tmp("graft_maint_tbl")
    def evRows(d: String, ids: Range): DataFrame = ids
      .map(i => (i.toLong, java.sql.Timestamp.valueOf(s"$d 10:0${i % 6}:00"), i.toLong % 5))
      .toDF("event_id", "ts", "user_id")
    TableManager.writePartitioned(
      evRows("2023-01-01", 0 until 10), t, "ts", Seq("event_id"))
    TableManager.writePartitioned(evRows("2024-01-01", 0 until 20), t, "ts",
      Seq("event_id"), mode = SaveMode.Append)
    (0 until 12).foreach(i => TableManager.writePartitioned(
      evRows("2024-01-02", (100 + i * 5) until (105 + i * 5)), t, "ts",
      Seq("event_id"), mode = SaveMode.Append))
    // staged erase of user 3 from 2024-01-01, crashed at the manifest
    val kept = spark.read.parquet(t)
      .filter(col("p_date").cast("string") === "2024-01-01" && col("user_id") =!= 3L)
      .localCheckpoint(true)
    EraseStage.stage(spark, t, Seq(
      EraseStage.Swap("", "p_date", Seq("2024-01-01"), Seq("event_id")) -> kept))

    // --- a search index fragmented by three append deltas
    val docs = Tables.documents(spark, sfDir)
    val sRoot = tmp("graft_maint_search")
    SearchIndex.materialize(docs.filter($"doc_id" % 3 === 0), sRoot)
    SearchIndex.append(spark, sRoot, docs.filter($"doc_id" % 3 === 1))
    SearchIndex.append(spark, sRoot, docs.filter($"doc_id" % 3 === 2))
    def sServed() = SearchIndex.query(spark, sRoot, docs.filter($"doc_id" < 5), 10)
      .collect().map(_.toString).sorted.toSeq
    val sWant = sServed()

    // --- an IVF index with cells fragmented by repeated appends
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Ann.coarseCentroids(emb, nCells = 4)
    val aRoot = tmp("graft_maint_ann")
    AnnIndex.materialize(emb.filter($"vec_id" % 3 === 0), centroids, aRoot)
    AnnIndex.append(spark, aRoot, emb.filter($"vec_id" % 3 === 1), centroids)
    AnnIndex.append(spark, aRoot, emb.filter($"vec_id" % 3 === 2), centroids)
    val aCount = spark.read.parquet(aRoot).count()

    // --- a media-ingest state, compacted through the generic wrapper
    val mPath = tmp("graft_maint_media") + "/m"
    val media = graft.multimodal.Media.mediaFromEvents(Tables.events(spark, sfDir))
    MediaIngest.processBatch(media.limit(500), 0L, mPath)
    MediaIngest.processBatch(media.limit(1000), 1L, mPath)
    val mWant = MediaIngest.readDedup(spark, mPath)
      .collect().map(_.toString).sorted.toSeq

    val tasks = Seq(
      Maintenance.DatedTable(t, Seq("event_id"),
        retentionDays = Some(60), nowDate = Some("2024-02-01")),
      Maintenance.Search(sRoot),
      Maintenance.Ann(aRoot, minFiles = 2),
      Maintenance.IngestCompact("media", s => MediaIngest.compact(s, mPath)))
    val log = Maintenance.run(spark, tasks)

    // ONE call: the staged erase completed, the expired date dropped,
    // the fragmented date + index roots rewrote
    assert(log.contains(s"recovered:$t"), log.mkString("\n"))
    assert(log.exists(_.startsWith(s"swept:$t/p_date=2023-01-01")), log.mkString("\n"))
    assert(log.exists(_.startsWith(s"compacted:$t/p_date=2024-01-02")), log.mkString("\n"))
    assert(log.contains(s"compacted:$sRoot"), log.mkString("\n"))
    assert(log.exists(_.startsWith(s"compacted:$aRoot/cell=")), log.mkString("\n"))
    assert(log.contains("ran:media"))
    // the recovered erase is VISIBLE: user 3 gone from the date it staged
    val after = spark.read.parquet(t)
    assert(after.filter(col("p_date").cast("string") === "2024-01-01" &&
      col("user_id") === 3L).isEmpty)
    assert(!new java.io.File(s"$t/p_date=2023-01-01").exists)
    assert(!new java.io.File(s"$t/_erase_stage").exists)
    // compaction changed no answers
    assert(sServed() === sWant)
    assert(spark.read.parquet(aRoot).count() === aCount)
    assert(MediaIngest.readDedup(spark, mPath)
      .collect().map(_.toString).sorted.toSeq === mWant)
    // fragmentation actually went away
    assert(new java.io.File(s"$t/p_date=2024-01-02").listFiles
      .count(_.getName.endsWith(".parquet")) <= 8)
    assert(spark.read.parquet(s"$sRoot/meta")
      .select($"delta_id").distinct().count() === 1L)

    // SECOND tick: nothing to recover, sweep, or compact — only the
    // unconditional ingest wrapper reports running
    val log2 = Maintenance.run(spark, tasks)
    assert(log2.forall(_.startsWith("ran:")), log2.mkString("\n"))
    assert(sServed() === sWant)
  }
}
