package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.serving.EraseStage

/** The staged-commit erase protocol ([[graft.serving.EraseStage]])
  * that closes the materialized-index pin-then-delete crash window:
  * every crash position — before the manifest, right after it, and
  * mid-apply with some partition directories already deleted — must
  * leave the index either untouched or recoverable to exactly the
  * clean-run result. The index erases themselves (SearchIndexSpec /
  * AnnIndexSpec / NearDupIndexSpec) keep asserting end-state
  * equality through this protocol; this spec pins the protocol's own
  * failure semantics on a synthetic layout.
  */
class EraseStageSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_erase_stage").toString

  /** A two-table toy index: `t` partitioned by p (0..3), `meta` an
    * additive delta log.
    */
  private def build(root: String): Unit = {
    (0L until 40L).map(i => (i, (i % 4).toInt)).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$root/t")
    Seq(("base", 40L)).toDF("delta_id", "n_delta")
      .write.mode("overwrite").parquet(s"$root/meta")
  }

  /** The erase under test: drop ids 1 and 5 (partition p=1), plus a
    * meta delta — one Swap leg + one Append leg.
    */
  private def legs(root: String): Seq[(EraseStage.Leg, DataFrame)] = {
    val keep = spark.read.parquet(s"$root/t")
      .filter(col("p") === 1 && !col("id").isin(1L, 5L))
      .localCheckpoint(true)
    Seq(
      EraseStage.Swap("t", "p", Seq("1")) -> keep,
      EraseStage.Append("meta") ->
        Seq(("erase_1_5", -2L)).toDF("delta_id", "n_delta"))
  }

  private def state(root: String): (Set[String], Set[String]) =
    (rows(spark.read.parquet(s"$root/t")),
      rows(spark.read.parquet(s"$root/meta")))

  test("clean run == stage+recover == stage+partial-delete+recover") {
    // reference: the clean, crash-free run
    val ref = tmp()
    build(ref)
    EraseStage.run(spark, ref, legs(ref))
    val want = state(ref)
    assert(!want._1.exists(_.startsWith("1|")) && want._1.exists(_.startsWith("9|")))

    // crash IMMEDIATELY after the manifest commit: nothing applied yet
    val a = tmp()
    build(a)
    EraseStage.stage(spark, a, legs(a))
    assert(EraseStage.recover(spark, a))
    assert(state(a) == want)
    assert(!EraseStage.recover(spark, a)) // stage fully consumed

    // crash MID-APPLY: the affected directory already deleted, kept
    // rows not yet appended — the exact window that used to lose rows
    val b = tmp()
    build(b)
    EraseStage.stage(spark, b, legs(b))
    val f = new org.apache.hadoop.fs.Path(b)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$b/t/p=1"), true)
    assert(EraseStage.recover(spark, b))
    assert(state(b) == want)
  }

  test("overwrite legs: stage+recover replaces the whole table with writer options applied") {
    val r = tmp()
    build(r)
    val leg: Seq[(EraseStage.Leg, DataFrame)] = Seq(
      EraseStage.Overwrite("t",
        Map("parquet.bloom.filter.enabled#id" -> "true")) ->
        spark.read.parquet(s"$r/t").filter(col("id") < 20).sort(col("id")))
    // commit, then crash before any apply — recover must complete the
    // whole-table replacement (the NearDupIndex docs/postings shape)
    EraseStage.stage(spark, r, leg)
    assert(EraseStage.recover(spark, r))
    val after = spark.read.parquet(s"$r/t")
    assert(after.count() == 20 && after.agg(max(col("id"))).head().getLong(0) == 19L)
    assert(!EraseStage.recover(spark, r))
    // a second, crash-free run over the rewritten table also works
    EraseStage.run(spark, r, Seq(
      EraseStage.Overwrite("t") ->
        spark.read.parquet(s"$r/t").filter(col("id") < 10)))
    assert(spark.read.parquet(s"$r/t").count() == 10)
  }

  test("crash BEFORE the manifest leaves the index untouched; the next run sweeps the debris") {
    val c = tmp()
    build(c)
    val before = state(c)
    // simulate: staged files written, no manifest (the commit point)
    spark.range(1).toDF("id").write.parquet(s"$c/_erase_stage/leg=0")
    assert(!EraseStage.recover(spark, c)) // not committed -> no-op
    assert(state(c) == before)
    EraseStage.run(spark, c, legs(c)) // sweeps debris, then erases
    assert(!state(c)._1.exists(_.startsWith("1|")))
    assert(!f(c).exists(new org.apache.hadoop.fs.Path(s"$c/_erase_stage")))
  }

  private def f(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("manifest hardening: root overwrite and separator characters are rejected before anything stages") {
    val r = tmp()
    build(r)
    val before = state(r)
    def rejected(leg: EraseStage.Leg): Unit = {
      intercept[IllegalArgumentException] {
        EraseStage.run(spark, r, Seq(leg -> spark.read.parquet(s"$r/t")))
      }
      // validation fires before the stage dir is touched: the index is
      // untouched and no debris or manifest exists
      assert(state(r) == before)
      assert(!f(r).exists(new org.apache.hadoop.fs.Path(s"$r/_erase_stage")))
    }
    // Overwrite("") would delete the _erase_stage dir its own staged
    // read depends on, mid-apply
    rejected(EraseStage.Overwrite(""))
    // the manifest is TSV with comma-joined lists — separators in any
    // field would corrupt the line format silently
    rejected(EraseStage.Swap("t", "p", Seq("1,2")))
    rejected(EraseStage.Swap("t", "p\tq", Seq("1")))
    rejected(EraseStage.Swap("t,u", "p", Seq("1")))
    rejected(EraseStage.Overwrite("t", Map("a=b" -> "c")))
    rejected(EraseStage.Overwrite("t", Map("k" -> "v,w")))
    rejected(EraseStage.Overwrite("t", Map.empty, Some("id\tx")))
    rejected(EraseStage.Append("t\nx"))
  }

  test("an older, shorter manifest recovers (absent fields = no sort/options); a longer one fails loudly") {
    // crash debris from a PREVIOUS format: 5 fields (no sort, no
    // options) — recover must treat the absent fields as empty, not
    // MatchError and brick every read of the root
    def keepOf(root: String) = spark.read.parquet(s"$root/t")
      .filter(col("p") === 1 && !col("id").isin(1L, 5L))
    val r = tmp()
    build(r)
    keepOf(r).write.parquet(s"$r/_erase_stage/leg=0")
    val w = new java.io.FileWriter(s"$r/_erase_stage/_manifest")
    try w.write("0\tswap\tt\tp\t1\n") finally w.close()
    assert(EraseStage.recover(spark, r))
    val t = spark.read.parquet(s"$r/t")
    assert(t.filter(col("p") === 1).count() === 8L)
    assert(t.filter(col("id").isin(1L, 5L)).isEmpty)
    // a NEWER writer's manifest (9 fields) must not recover with
    // fields silently dropped
    val r2 = tmp()
    build(r2)
    keepOf(r2).write.parquet(s"$r2/_erase_stage/leg=0")
    val w2 = new java.io.FileWriter(s"$r2/_erase_stage/_manifest")
    try w2.write("0\tswap\tt\tp\t1\t\t\t1\tfuture-field\n") finally w2.close()
    val e = intercept[Exception] { EraseStage.recover(spark, r2) }
    assert(e.getMessage.contains("newer"), e.getMessage)
  }

  test("Swap sortCols in the manifest restore the serving layout: one file per partition, sorted within") {
    val r = tmp()
    (0L until 2000L).map(i => (i, (i % 4).toInt, i % 13))
      .toDF("id", "p", "k")
      .write.mode("overwrite").partitionBy("p").parquet(s"$r/t")
    // stage a two-partition rewrite from a scrambled, multi-split
    // frame; the manifest's sortCols must re-establish the layout
    val kept = spark.read.parquet(s"$r/t")
      .filter(col("p").isin(1, 2) && col("id") % 5 =!= 0L)
      .repartition(8)
    EraseStage.stage(spark, r, Seq(
      EraseStage.Swap("t", "p", Seq("1", "2"), Seq("id")) -> kept))
    assert(EraseStage.recover(spark, r))
    for (p <- Seq(1, 2)) {
      val files = Option(new java.io.File(s"$r/t/p=$p").listFiles).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
      assert(files.size === 1, s"p=$p should be one file, got ${files.size}")
      val ids = spark.read.parquet(files.head.toString)
        .select(col("id")).collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"p=$p file not sorted by id")
      assert(ids.nonEmpty && ids.forall(_ % 5 != 0L))
    }
    // untouched partitions keep their old rows
    assert(spark.read.parquet(s"$r/t").filter(col("p") === 0).count() === 500L)
  }

  test("Swap shards > 1: each rewritten partition splits into that many files, each sorted") {
    val r = tmp()
    (0L until 3000L).map(i => (i, (i % 3).toInt))
      .toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$r/t")
    val kept = spark.read.parquet(s"$r/t")
      .filter(col("p").isin(1, 2)).repartition(8)
    EraseStage.stage(spark, r, Seq(
      EraseStage.Swap("t", "p", Seq("1", "2"), Seq("id"), shards = 3) -> kept))
    assert(EraseStage.recover(spark, r))
    // hash assignment of (partition, shard) to tasks can collide, so
    // the count is "more than one, at most shards" — the parallelism
    // claim — while EVERY file stays internally sorted
    val counts = Seq(1, 2).map { p =>
      val files = Option(new java.io.File(s"$r/t/p=$p").listFiles).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
      assert(files.size <= 3, s"p=$p has ${files.size} files > shards")
      files.foreach { fl =>
        val ids = spark.read.parquet(fl.toString)
          .select(col("id")).collect().map(_.getLong(0)).toSeq
        assert(ids === ids.sorted, s"shard file of p=$p not sorted")
        assert(ids.nonEmpty)
      }
      files.size
    }
    assert(counts.exists(_ > 1), s"no partition split across tasks: $counts")
    // lossless across the shard split
    assert(spark.read.parquet(s"$r/t").count() === 3000L)
    // a 7-field manifest (older writer, no shards field) still applies
    // through the same padded path — covered by the version case above
  }

  test("Overwrite sortCol re-sorts after the staged round-trip: per-file ranges stay disjoint") {
    val r = tmp()
    (0L until 4000L).map(i => (i, (i % 7).toInt)).toDF("id", "x")
      .sort(col("id"))
      .write.mode("overwrite").parquet(s"$r/t")
    // stage a whole-table rewrite from a deliberately SCRAMBLED frame:
    // without the manifest-recorded sort, apply() would rewrite the
    // table in the staged files' arbitrary read order and per-file
    // min/max pruning on id would degrade
    val scrambled = spark.read.parquet(s"$r/t")
      .repartition(8, col("x"))
    EraseStage.stage(spark, r, Seq(
      EraseStage.Overwrite("t", Map.empty, Some("id")) -> scrambled))
    // AQE would coalesce 4000 tiny rows into one post-sort partition,
    // leaving a single file that proves nothing about the layout
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try assert(EraseStage.recover(spark, r))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val t = spark.read.parquet(s"$r/t")
    assert(t.count() == 4000L)
    val files = Option(new java.io.File(s"$r/t").listFiles).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.size > 1, s"need multiple files to prove the layout, got ${files.size}")
    val ranges = files.map { fp =>
      val mm = spark.read.parquet(fp).agg(min(col("id")), max(col("id"))).head()
      (mm.getLong(0), mm.getLong(1))
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo, _)) =>
      assert(hi < lo, s"file id ranges interleave: $ranges") }
  }

  test("MoveIn: exactly-once file-move append — existing files untouched, partial apply completes without duplication") {
    import org.apache.hadoop.fs.Path
    val root = tmp()
    build(root)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(p: Int) = Option(f.listStatus(new Path(s"$root/t/p=$p")))
      .toSeq.flatten.map(s => (s.getPath.getName, s.getModificationTime))
      .filter(_._1.endsWith(".parquet")).toSet
    val before = (0 to 3).map(p => p -> partFiles(p)).toMap
    // rows for an existing partition (1) and a brand-new one (7)
    val incoming = Seq((100L, 1), (101L, 1), (102L, 7)).toDF("id", "p")
    def moveLeg = EraseStage.MoveIn("t", "p", Seq("id")) -> incoming

    // clean run: appended rows visible, every pre-existing file
    // byte/mtime-identical, exactly one new file per touched partition
    EraseStage.run(spark, root, Seq(moveLeg))
    val afterClean = rows(spark.read.parquet(s"$root/t"))
    assert(afterClean === rows((0L until 40L).map(i => (i, (i % 4).toInt))
      .toDF("id", "p").union(incoming)))
    (0 to 3).foreach { p =>
      assert(before(p).subsetOf(partFiles(p)), s"existing files of p=$p touched")
    }
    assert(partFiles(1).size === before(1).size + 1, "expected ONE appended file")
    assert(partFiles(7).size === 1)

    // crash MID-APPLY: stage, then hand-move one staged file (as a
    // prior apply attempt would have), then recover — the remaining
    // files move, the already-moved one is not duplicated
    val root2 = tmp()
    build(root2)
    EraseStage.stage(spark, root2, Seq(
      EraseStage.MoveIn("t", "p", Seq("id")) -> incoming))
    val f2 = new Path(root2).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedP1 = f2.listStatus(new Path(s"$root2/_erase_stage/leg=0/p=1"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    f2.mkdirs(new Path(s"$root2/t/p=1"))
    assert(f2.rename(stagedP1, new Path(s"$root2/t/p=1/${stagedP1.getName}")))
    assert(EraseStage.recover(spark, root2))
    assert(rows(spark.read.parquet(s"$root2/t")) === afterClean,
      "partial-move recovery duplicated or lost rows")
    assert(!f2.exists(new Path(s"$root2/_erase_stage")))
  }
}
