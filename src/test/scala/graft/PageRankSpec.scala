package graft

import org.apache.spark.sql.functions._
import graft.ops.PageRank
import graft.queries.AnalyticsQueries

/** Exact-integer PageRank ([[graft.ops.PageRank]]): distributed
  * iterations vs a sequential BigInt reference, structural rank
  * ordering, and dangling-mass decay.
  */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential reference: same formula, BigInt floor division;
    * `seeds` restricts the restart targets (personalized variant).
    */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
      d: Long = 850L, scale: Long = 1000000000000L,
      seeds: Option[Set[String]] = None): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val isSeed = (v: String) => seeds.forall(_.contains(v))
    val n = nodes.count(isSeed)
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = ((BigInt(1000 - d) * scale) / (BigInt(1000) * n)).toLong
    var r = nodes.map(v =>
      v -> (if (isSeed(v)) BigInt(scale) / n else BigInt(0))).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (u, v, w) =>
          v -> (BigInt(d) * r(u) * w) / (BigInt(1000) * outW(u))
        }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = nodes.map(v => v ->
        ((if (isSeed(v)) BigInt(base) else BigInt(0))
          + contrib.getOrElse(v, BigInt(0)))).toMap
    }
    r.map { case (k, v) => k -> v.toLong }
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] =
    PageRank.ranks(edges.toDF("src", "dst", "w"), iters)
      .as[(String, Long)].collect().toMap

  test("ranks match the sequential BigInt reference on the real transition graph") {
    val edges = AnalyticsQueries.eventTransitionsOf(Tables.events(spark, sfDir))
      .select($"from_type", $"to_type", $"n_trans")
      .as[(String, String, Long)].collect().toSeq
    for (iters <- Seq(0, 1, 4))
      assert(run(edges, iters) === reference(edges, iters),
        s"mismatch at iters=$iters")
  }

  test("personalized ranks match the seeded reference; seed dominates") {
    val edges = AnalyticsQueries.eventTransitionsOf(Tables.events(spark, sfDir))
      .select($"from_type", $"to_type", $"n_trans")
      .as[(String, String, Long)].collect().toSeq
    val got = PageRank.personalizedRanks(
        edges.toDF("src", "dst", "w"), seeds = Seq("signup"), iters = 4)
      .as[(String, Long)].collect().toMap
    assert(got === reference(edges, 4, seeds = Some(Set("signup"))))
    // restart mass pins the seed above every other node on this
    // near-uniform graph
    assert(got("signup") === got.values.max)
  }

  test("structure: a hub everyone links to outranks the leaves") {
    val edges = Seq(
      ("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L),
      ("hub", "a", 1L), ("hub", "b", 1L), ("hub", "c", 1L))
    val r = run(edges, 6)
    assert(r("hub") > r("a") && r("a") === r("b") && r("b") === r("c"))
    // no dangling nodes: total mass stays within integer-floor loss
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L)
  }

  test("dangling sink: mass decays deterministically, matching the reference") {
    val edges = Seq(("a", "sink", 7L)) // sink has no out-edges
    val r6 = run(edges, 6)
    assert(r6 === reference(edges, 6))
    assert(r6.values.sum < 1000000000000L / 2) // most mass has leaked
  }

  test("reliable round checkpoints when a checkpoint dir is set: same ranks, superseded rounds deleted") {
    // The cluster-mode policy (NearDup.roundCheckpoint's switch):
    // with sc.setCheckpointDir configured, per-iteration rank frames
    // go to fault-tolerant storage — executor loss mid-run recomputes
    // nothing — and each superseded round's rdd-<id> directory is
    // deleted once the next materializes, so a 50-iteration run holds
    // two rounds of footprint, not 50. NOTE: the shared session keeps
    // the checkpoint dir for the rest of the JVM (Spark has no
    // unset); later iterative ops simply keep exercising the
    // reliable path, as NearDupSpec's twin test already does.
    val edges = AnalyticsQueries.eventTransitionsOf(Tables.events(spark, sfDir))
      .select($"from_type", $"to_type", $"n_trans")
      .as[(String, String, Long)].collect().toSeq
    val localMode = run(edges, 4) // before the dir is set
    val ckptDir = java.nio.file.Files.createTempDirectory("pagerank_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val reliable = PageRank.ranks(edges.toDF("src", "dst", "w"), iters = 4)
    assert(reliable.as[(String, Long)].collect().toMap === localMode)
    def rddDirs(p: java.io.File): Seq[String] =
      Option(p.listFiles).toSeq.flatten.flatMap { f =>
        if (f.getName.startsWith("rdd-")) Seq(f.getPath)
        else if (f.isDirectory) rddDirs(f) else Nil
      }
    // only the FINAL round's files survive (they back the returned
    // frame); nodes + all superseded rounds are released
    assert(rddDirs(new java.io.File(ckptDir)).size === 1,
      "superseded round checkpoints were not deleted")
    // the returned frame stays evaluable off its own checkpoint
    assert(reliable.count() > 0)
  }
}
