package graft

import org.apache.spark.sql.functions._
import graft.queries.{DocQueries, EmbedQueries}

/** The served hybrid-retrieval composition: both legs probe their
  * materialized serving indexes (inverted search index + IVF index),
  * and the fused ranking equals a direct recompute of both legs —
  * the table-routing discipline of the reference's query service
  * (every query reads the materialized tables, never the raw stream).
  */
class HybridSearchSpec extends SparkSuite {
  import spark.implicits._

  test("served hybrid fusion equals direct-leg recompute") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val sparse = graft.ops.SparseSearch.rankedRetrieval(docs, qids, k = 10)
      .select($"query_id", $"doc_id".as("id"), $"rank")
    val dense = graft.ops.Ann.bruteForceKnn(
        emb, emb.filter($"vec_id".isInCollection(qids)), k = 10)
      .select($"query_id", $"neighbor_id".as("id"), $"rank")
    val direct = graft.ops.HybridSearch.rrfFuse(Seq(sparse, dense), k = 10)
      .select($"query_id", $"rank", $"id".as("doc_id"), $"rrf_scaled", $"n_legs")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val served = DocQueries.docSearchHybrid(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("offline hybrid: fusing the distributed legs equals fusing the serving legs") {
    // rrfFuse is leg-agnostic by design — the offline composition is
    // the same fusion over SearchIndex.queryAll + AnnIndex shuffle
    // mode, for all-vs-index hybrid re-ranking at corpus volume
    val searchRoot = DocQueries.searchIndexRoot(spark, sfDir)
    val annRoot = EmbedQueries.annIndexRoot(spark, sfDir)
    val cens = EmbedQueries.annCentroids(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val qDocs = (1 to 4).map(r =>
        docs.select(($"doc_id" + lit(r * 10000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
    val qEmb = (1 to 4).map(r =>
        emb.select(($"vec_id" + lit(r * 10000L)).as("vec_id"), $"embedding"))
      .reduce(_ unionByName _)
    def fuse(sparse: org.apache.spark.sql.DataFrame,
        dense: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
      graft.ops.HybridSearch.rrfFuse(Seq(
          sparse.select($"query_id", $"doc_id".as("id"), $"rank"),
          dense.select($"query_id", $"neighbor_id".as("id"), $"rank")), k = 10)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val offline = fuse(
      graft.serving.SearchIndex.queryAll(spark, searchRoot, qDocs, k = 10),
      graft.serving.AnnIndex.query(spark, annRoot, qEmb, cens, k = 10,
        nprobe = 16, broadcastQueries = false))
    val servingLegs = fuse(
      graft.serving.SearchIndex.query(spark, searchRoot, qDocs, k = 10),
      graft.serving.AnnIndex.query(spark, annRoot, qEmb, cens, k = 10, nprobe = 16))
    assert(offline === servingLegs)
    assert(offline.nonEmpty)
  }

  test("hybrid query reads BOTH materialized index roots") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    // build both indexes BEFORE capturing, so the scans observed below
    // are query-path reads, not index construction
    val searchRoot = DocQueries.searchIndexRoot(spark, sfDir)
    val annRoot = EmbedQueries.annIndexRoot(spark, sfDir)
    @volatile var scannedRoots = Set.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val roots = findScans(qe.executedPlan)
          .flatMap(_.relation.location.rootPaths.map(_.toString))
        scannedRoots = scannedRoots ++ roots
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      DocQueries.docSearchHybrid(spark, sfDir).collect()
      // the listener bus is async — wait for both captures
      val deadline = System.currentTimeMillis() + 30000
      def seen(root: String) = scannedRoots.exists(_.contains(root))
      while (!(seen(searchRoot) && seen(annRoot)) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen(searchRoot),
        s"sparse leg did not read the materialized search index at $searchRoot")
      assert(seen(annRoot),
        s"dense leg did not read the materialized IVF index at $annRoot")
    } finally spark.listenerManager.unregister(listener)
  }
}
