package graft

import org.apache.spark.sql.functions._
import graft.serving.StarTree

/** The materialized star-tree: every node ≡ a raw GROUP BY recompute,
  * node routing hits the right grouping set, and a node read prunes to
  * exactly one partition directory.
  */
class StarTreeSpec extends SparkSuite {

  private lazy val events = Tables.events(spark, sfDir)
    .select(col("event_type"),
      (((dayofweek(col("ts")) + lit(5)) % 7) + 1).cast("long").as("day_of_week_iso"),
      hour(col("ts")).cast("long").as("hour_of_day"),
      col("value_cents"))

  test("nodeId bitmask: requested dims clear their bit, high bit first") {
    assert(StarTree.nodeId(StarTree.dims.toSet) === 0)
    assert(StarTree.nodeId(Set.empty) === 7)
    assert(StarTree.nodeId(Set("event_type")) === 3)
    assert(StarTree.nodeId(Set("day_of_week_iso", "hour_of_day")) === 4)
    intercept[IllegalArgumentException](StarTree.nodeId(Set("user_id")))
  }

  test("every node equals the raw GROUP BY over its dim subset") {
    for (sub <- StarTree.dims.toSet.subsets()) {
      val gd = StarTree.dims.filter(sub) // tree order
      val got = StarTree.aggregate(spark, sfDir, gd)
        .collect().map(_.toSeq).toSet
      val expected = (if (gd.isEmpty) events.groupBy()
                      else events.groupBy(gd.map(col): _*))
        .agg(count(lit(1)).as("order_count"),
          sum(col("value_cents")).as("sum_value_cents"))
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"node for $gd diverges from raw recompute")
      assert(got.nonEmpty)
    }
  }

  test("refresh merges a batch additively; replayed batch is a no-op") {
    val ev = Tables.events(spark, sfDir)
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    val inc = java.nio.file.Files.createTempDirectory("startree_inc").toString
    val full = java.nio.file.Files.createTempDirectory("startree_full").toString
    StarTree.materializeInto(spark, inc, half1)
    StarTree.refresh(spark, inc, half2, batchId = 0L)
    StarTree.materializeInto(spark, full, ev)
    def nodes(r: String) = spark.read.parquet(s"$r/nodes")
      .collect().map(_.toSeq).toSet
    assert(nodes(inc) === nodes(full), "refreshed tree diverges from full rebuild")
    StarTree.refresh(spark, inc, half2, batchId = 0L) // at-least-once replay
    assert(nodes(inc) === nodes(full), "replayed batch changed the tree")
  }

  test("user erasure: tree == rebuild-without-user; replayed batch can't resurface; refresh continues") {
    val ev = Tables.events(spark, sfDir)
    val victim = ev.agg(min(col("user_id"))).head().getLong(0)
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    val t = java.nio.file.Files.createTempDirectory("startree_erase").toString
    StarTree.materializeInto(spark, t, half1)
    StarTree.refresh(spark, t, half2, batchId = 0L)
    val retained = ev.filter(col("user_id") =!= victim)
    StarTree.eraseUser(spark, t, ev, victim)
    val want = java.nio.file.Files.createTempDirectory("startree_erase_rb").toString
    StarTree.materializeInto(spark, want, retained)
    def nodes(r: String) = spark.read.parquet(s"$r/nodes")
      .collect().map(_.toSeq).toSet
    assert(nodes(t) === nodes(want), "erased tree diverges from rebuild-without-user")
    // the recorded batch id survives the erase: a replay of the
    // already-applied batch is still a no-op (erased mass stays out)
    StarTree.refresh(spark, t, half2, batchId = 0L)
    assert(nodes(t) === nodes(want), "replayed batch resurfaced erased mass")
    // post-erase refresh of genuinely new mass merges correctly
    StarTree.refresh(spark, t, half1.filter(col("user_id") =!= victim), batchId = 1L)
    val want2 = java.nio.file.Files.createTempDirectory("startree_erase_rb2").toString
    StarTree.materializeInto(spark, want2,
      retained.unionByName(half1.filter(col("user_id") =!= victim)))
    assert(nodes(t) === nodes(want2))
  }

  test("a node read prunes to one partition directory") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val df = StarTree.aggregate(spark, sfDir, Seq("event_type"))
    df.collect()
    val scans = findScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan in the node-read plan")
    // all 8 gid directories exist; the node read must touch exactly 1
    assert(scans.map(_.metrics("numPartitions").value).max === 1L,
      "node read touched more than its own gid directory")
    val root = StarTree.materialize(spark, sfDir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gids = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/nodes/gid=*")).length
    assert(gids === 8, s"expected 8 node directories, found $gids")
  }
}
