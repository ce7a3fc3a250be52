package graft

import org.apache.spark.sql.functions._
import graft.ops.Ann
import graft.serving.AnnIndex

/** The materialized IVF index: layout, dynamic partition pruning at
  * the probe, exhaustive-probe exactness, and recall at the
  * approximate operating point.
  */
class AnnIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val centroids = Ann.coarseCentroids(emb, nCells = 8)
  private lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("ann_index_spec").toString
    AnnIndex.materialize(emb, centroids, p)
    p
  }

  test("layout: one directory per probed cell, vectors stored as double + norm") {
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.nonEmpty && dirs.length <= 8, dirs.mkString(","))
    val read = spark.read.parquet(root)
    assert(read.columns.sorted === Array("cell", "np", "nrm", "v", "vec_id", "vp"))
    // every corpus row landed in exactly one cell
    assert(read.count() === emb.count())
    // the stored Matryoshka prefix is exactly the first prefixDims
    // dims of the full vector, with its own norm
    assert(AnnIndex.prefixDims(spark, root) === AnnIndex.defaultPrefixDims)
    assert(read.filter(
      col("vp") =!= slice(col("v"), 1, AnnIndex.defaultPrefixDims)).isEmpty)
  }

  test("truncated (MRL-prefix) query over the index equals the in-memory two-stage operator") {
    val queries = emb.filter($"vec_id" < 10)
    val served = AnnIndex.queryTruncated(spark, root, queries, k = 5, candidates = 50)
    val inMem = Ann.truncatedKnn(emb, queries, k = 5, prefixDims = 16, candidates = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(served.as[(Long, Long, Long)].collect().toSet === inMem)
    assert(inMem.nonEmpty)
    // the stage-1 prefilter scan reads the SMALL prefix columns and
    // must NOT touch the full vector column — the storage-layer claim
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val scans = findScans(served.queryExecution.executedPlan)
      .filter(_.toString.contains("parquet"))
    val prefilter = scans.filter(_.requiredSchema.fieldNames.contains("vp"))
    assert(prefilter.nonEmpty, "no prefix-column scan found")
    prefilter.foreach { s =>
      assert(!s.requiredSchema.fieldNames.contains("v"),
        s"prefilter scan reads the full vector column: ${s.requiredSchema.catalogString}")
    }
  }

  test("exhaustive probe over the index equals brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val served = AnnIndex.query(spark, root, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    val exact = Ann.bruteForceKnn(emb, queries, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(served === exact)
  }

  test("probe scan is dynamically partition-pruned; partitions read scale with nprobe") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    def filesRead(nprobe: Int): (Long, String) = {
      val df = AnnIndex.query(spark, root,
        emb.filter($"vec_id" === 3), centroids, k = 5, nprobe = nprobe)
      df.collect()
      val scan = findScans(df.queryExecution.executedPlan)
        .find(_.toString.contains("parquet"))
        .getOrElse(fail("no parquet scan in plan"))
      (scan.metrics("numFiles").value, scan.toString)
    }
    val (narrow, scanStr) = filesRead(1)
    val (wide, _) = filesRead(8)
    // the cell filter must be a DYNAMIC pruning expression on the
    // partition column — proof the probe set reached the scan
    assert(scanStr.toLowerCase.contains("dynamicpruning"), scanStr.take(800))
    assert(wide > narrow,
      s"pruned scan should read fewer files at nprobe=1 ($narrow) than nprobe=8 ($wide)")
  }

  test("offline shuffle mode (broadcastQueries=false) matches the serving path on a 10k-query frame") {
    val qs = (1 to 20).map(r =>
        emb.select(($"vec_id" + lit(r * 10000L)).as("vec_id"), $"embedding"))
      .reduce(_ unionByName _)
    assert(qs.count() === 10000L)
    val offline = AnnIndex.query(spark, root, qs, centroids, k = 5, nprobe = 8,
        broadcastQueries = false)
      .as[(Long, Long, Long)].collect().toSet
    val servedRes = AnnIndex.query(spark, root, qs, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(offline === servedRes)
    assert(offline.nonEmpty)
  }

  test("incremental append: built-half + appended-half equals full rebuild; replay is a no-op") {
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
    val p = java.nio.file.Files.createTempDirectory("ann_index_inc").toString
    AnnIndex.materialize(half1, centroids, p)
    AnnIndex.append(spark, p, half2, centroids)
    val queries = emb.filter($"vec_id" < 10)
    val inc = AnnIndex.query(spark, p, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    val full = AnnIndex.query(spark, root, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(inc === full)
    // replaying the same batch (at-least-once delivery) adds nothing
    val before = spark.read.parquet(p).count()
    AnnIndex.append(spark, p, half2, centroids)
    assert(spark.read.parquet(p).count() === before)
  }

  test("cell compaction: fragmented cells rewrite to one file, untouched cells keep their files; queries identical") {
    val p = java.nio.file.Files.createTempDirectory("ann_index_cmp").toString
    // fragment: 6 small appends leave ~6 files in every touched cell
    (0 until 6).foreach(i =>
      AnnIndex.append(spark, p, emb.filter($"vec_id" % 6 === i), centroids))
    val queries = emb.filter($"vec_id" < 10)
    val baseline = AnnIndex.query(spark, p, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    def filesPerCell(): Map[String, Int] =
      Option(new java.io.File(p).listFiles).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles.count(_.getName.endsWith(".parquet"))).toMap
    val before = filesPerCell()
    val fragmented = before.filter(_._2 >= 4).keySet.map(_.stripPrefix("cell="))
    assert(fragmented.nonEmpty) // the scenario is non-vacuous
    val compacted = AnnIndex.compactCells(spark, p, minFiles = 4).toSet
    assert(compacted === fragmented)
    val after = filesPerCell()
    compacted.foreach(c => assert(after(s"cell=$c") === 1))
    before.filter(_._2 < 4).foreach { case (c, n) => assert(after(c) === n) }
    assert(AnnIndex.query(spark, p, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet === baseline)
    // append-after-compact stays idempotent (the content-keyed guard
    // reads the rewritten layout)
    val rows = spark.read.parquet(p).count()
    AnnIndex.append(spark, p, emb.filter($"vec_id" % 6 === 0), centroids)
    assert(spark.read.parquet(p).count() === rows)
    // nothing fragmented -> no-op
    assert(AnnIndex.compactCells(spark, p, minFiles = 4).isEmpty)
  }

  test("vector erasure: erased index equals brute force without the vectors; replay no-op") {
    val erased = (30L to 34L).toSeq
    val p = java.nio.file.Files.createTempDirectory("ann_index_erase").toString
    AnnIndex.materialize(emb, centroids, p)
    AnnIndex.erase(spark, p, erased)
    val queries = emb.filter($"vec_id" < 10)
    // exhaustive probe ≡ brute force, so the erased index must match
    // brute force over the corpus without the erased vectors
    val got = AnnIndex.query(spark, p, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    val want = Ann.bruteForceKnn(emb.filter(!$"vec_id".isin(erased: _*)), queries, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // nothing of the erased vectors remains (prefix column included)
    assert(spark.read.parquet(p).filter($"vec_id".isin(erased: _*)).isEmpty)
    // re-erase (crash retry / absent ids): no-op
    val before = spark.read.parquet(p).count()
    AnnIndex.erase(spark, p, erased)
    assert(spark.read.parquet(p).count() === before)
    assert(before === emb.count() - erased.size)
  }

  test("read-path recovery: crash at the manifest, then a plain query serves the post-erase answer") {
    val erased = (30L to 34L).toSeq
    val p = java.nio.file.Files.createTempDirectory("ann_index_rp").toString
    AnnIndex.materialize(emb, centroids, p)
    // crash exactly AT the commit point: legs staged + manifest
    // written, nothing applied — the next read must complete it
    graft.serving.EraseStage.stage(spark, p,
      AnnIndex.eraseLegs(spark, p, erased))
    val queries = emb.filter($"vec_id" < 10)
    val got = AnnIndex.query(spark, p, queries, centroids, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    val want = Ann.bruteForceKnn(emb.filter(!$"vec_id".isin(erased: _*)), queries, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(!new java.io.File(s"$p/_erase_stage").exists,
      "the query's recovery must consume the stage")
    // the truncated path recovers too (fresh crash, fresh stage)
    graft.serving.EraseStage.stage(spark, p,
      AnnIndex.eraseLegs(spark, p, Seq(35L)))
    AnnIndex.queryTruncated(spark, p, queries, k = 5, candidates = 50).collect()
    assert(spark.read.parquet(p).filter($"vec_id" === 35L).isEmpty)
  }

  test("codebook reindex: retrain + re-encode + swap is one staged commit; answers unchanged, layout moved") {
    val p = java.nio.file.Files.createTempDirectory("ann_index_ri").toString
    // deliberately coarse initial book: 4 cells
    val oldBook = Ann.coarseCentroids(emb, nCells = 4)
    AnnIndex.materialize(emb, oldBook, p)
    assert(AnnIndex.storedCentroids(spark, p) === oldBook)
    def cellDirs() = new java.io.File(p).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted.toSeq
    def cellOf() = spark.read.parquet(p).select($"vec_id", $"cell")
      .as[(Long, Int)].collect().toMap
    val oldCells = cellOf()
    val queries = emb.filter($"vec_id" < 10)
    val before = AnnIndex.queryStored(spark, p, queries, k = 5, nprobe = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(before === Ann.bruteForceKnn(emb, queries, k = 5)
      .as[(Long, Long, Long)].collect().toSet)
    // refresh to the Lloyd-refined 8-cell book
    val newBook = graft.ops.KMeans.refinedCentroids(emb, k = 8)
    AnnIndex.reindex(spark, p, newBook)
    assert(AnnIndex.storedCentroids(spark, p) === newBook)
    assert(!new java.io.File(s"$p/_erase_stage").exists)
    // every vector re-encoded to its new nearest centroid, corpus intact
    val reread = spark.read.parquet(p)
    assert(reread.count() === emb.count())
    assert(reread.filter($"cell" =!=
      graft.functions.Vectors.nearestCentroid($"v", newBook).cast("int")).isEmpty)
    assert(cellOf() !== oldCells, "reindex must actually move assignments")
    assert(cellDirs().forall(d =>
      (0 until 8).map(i => s"cell=$i").contains(d)))
    // vector CONTENT moved not at all: exhaustive probe identical
    val after = AnnIndex.queryStored(spark, p, queries, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(after === before)
    // a second reindex with the same book is layout-idempotent
    AnnIndex.reindex(spark, p, newBook)
    assert(cellOf() === spark.read.parquet(p).select($"vec_id", $"cell")
      .as[(Long, Int)].collect().toMap)
    assert(AnnIndex.queryStored(spark, p, queries, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet === before)
  }

  test("reindex crash at the manifest: the next stored-codebook read serves the COMPLETE new index") {
    val p = java.nio.file.Files.createTempDirectory("ann_index_ric").toString
    AnnIndex.materialize(emb, Ann.coarseCentroids(emb, nCells = 4), p)
    val queries = emb.filter($"vec_id" < 10)
    val want = AnnIndex.queryStored(spark, p, queries, k = 5, nprobe = 4)
      .as[(Long, Long, Long)].collect().toSet
    val newBook = graft.ops.KMeans.refinedCentroids(emb, k = 8)
    // crash exactly AT the commit point: both legs staged (re-encoded
    // corpus + new codebook), nothing applied
    graft.serving.EraseStage.stage(spark, p,
      AnnIndex.reindexLegs(spark, p, newBook))
    // the next read recovers FIRST and then reads book + cells from
    // the same post-apply state — never the old book over new cells
    val got = AnnIndex.queryStored(spark, p, queries, k = 5, nprobe = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(AnnIndex.storedCentroids(spark, p) === newBook)
    assert(!new java.io.File(s"$p/_erase_stage").exists)
    assert(spark.read.parquet(p).filter($"cell" >= 4).count() > 0,
      "recovery must have applied the new 8-cell assignment")
  }

  test("recall at nprobe=2 is high but the probe is genuinely partial") {
    val queries = emb.filter($"vec_id" < 20)
    val served = AnnIndex.query(spark, root, queries, centroids, k = 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Ann.bruteForceKnn(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (served & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    assert(served.size <= exact.size) // partial probe can only lose candidates
  }
}
