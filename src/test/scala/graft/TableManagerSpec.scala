package graft

import org.apache.spark.sql.functions._
import graft.ops.Rollup
import graft.tables.TableManager

class TableManagerSpec extends SparkSuite {
  import spark.implicits._

  test("partitioned write → partition pruning + retention sweep + compaction") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl").toString
    val ev = Tables.events(spark, sfDir)

    TableManager.writePartitioned(ev, s"$dir/raw", "ts",
      sortCols = Seq("event_type", "ts"), bloomCol = Some("event_id"))
    val back = spark.read.parquet(s"$dir/raw")
    assert(back.count() === ev.count())

    // partition pruning: a one-day filter must not read all partitions
    val oneDay = back.filter(col("p_date") === lit("2024-01-03"))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(back.select("p_date").distinct().count() > 1)
    assert(oneDay.count() ===
      ev.filter(to_date(col("ts")) === lit("2024-01-03")).count())

    // retention: drop partitions older than 2 days relative to 2024-01-05
    val dropped = TableManager.retentionSweep(spark, s"$dir/raw", 2, "2024-01-05")
    assert(dropped.nonEmpty)
    val after = spark.read.parquet(s"$dir/raw")
    assert(after.filter(col("p_date") < lit("2024-01-03")).count() === 0)

    // compaction: hourly table conserves minute-rollup totals
    val r1m = Rollup.rollup1m(ev)
      .withColumn("ts", timestamp_millis(col("window_start_ms")))
    TableManager.writePartitioned(r1m, s"$dir/rollup1m", "ts",
      sortCols = Seq("event_type", "window_start_ms"))
    TableManager.compactToHourly(spark, s"$dir/rollup1m", s"$dir/rollup1h", Seq("event_type"))
    val h = spark.read.parquet(s"$dir/rollup1h")
    assert(h.agg(sum("order_count")).head.getLong(0) === ev.count())
  }

  test("raw-store user erasure rewrites only touched dates; sole-owner date vanishes; no-op on unknown user") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_erase_raw").toString
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "click", 3.0),
      (2L, Timestamp.valueOf("2024-01-01 10:20:00"), 2L, "view", 5.0),
      (3L, Timestamp.valueOf("2024-01-02 09:00:00"), 1L, "click", 2.0),
      (4L, Timestamp.valueOf("2024-01-03 09:00:00"), 3L, "click", 9.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    TableManager.writePartitioned(ev, s"$dir/raw", "ts",
      sortCols = Seq("event_type", "ts"), bloomCol = Some("event_id"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes(d: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/raw/p_date=$d"))
        .map(_.getModificationTime).toSeq.sorted
    val untouchedBefore = mtimes("2024-01-03")

    assert(TableManager.eraseUser(spark, s"$dir/raw", "ts",
      Seq("event_type", "ts"), "user_id", 99L, Some("event_id")) === Nil)

    // user 1 is on 01-01 (shared with user 2) and sole owner of 01-02
    val affected = TableManager.eraseUser(spark, s"$dir/raw", "ts",
      Seq("event_type", "ts"), "user_id", 1L, Some("event_id"))
    assert(affected === Seq("2024-01-01", "2024-01-02"))
    val back = spark.read.parquet(s"$dir/raw")
    assert(back.filter(col("user_id") === 1L).count() === 0)
    assert(back.select("event_id").as[Long].collect().toSet === Set(2L, 4L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/raw/p_date=2024-01-02")))
    // the untouched date's files were not rewritten
    assert(mtimes("2024-01-03") === untouchedBefore)
  }

  test("compactDates merges micro-batch file debris, preserves rows/sort/bloom, and is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val ev = Tables.events(spark, sfDir)
    // simulate a streaming file sink: several appends, each leaving
    // its own files in every date partition
    for (_ <- 1 to 4)
      TableManager.writePartitioned(ev, s"$dir/raw", "ts",
        sortCols = Seq("event_type", "ts"), bloomCol = Some("event_id"),
        mode = org.apache.spark.sql.SaveMode.Append)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesPerDate: Map[String, Int] =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/raw/p_date=*")).toSeq
        .map(p => p.getPath.getName ->
          fs.listStatus(p.getPath).count(f => f.isFile &&
            !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")))
        .toMap
    val before = filesPerDate
    assert(before.values.forall(_ >= 4), s"append setup produced $before")
    val rowsBefore = spark.read.parquet(s"$dir/raw")
      .drop("p_date").collect().map(_.toString).sorted.toSeq

    val compacted = TableManager.compactDates(spark, s"$dir/raw",
      sortCols = Seq("event_type", "ts"), bloomCol = Some("event_id"), maxFiles = 2)
    assert(compacted.toSet === before.keySet, "every oversized date compacts")
    val after = filesPerDate
    assert(after.values.forall(n => n >= 1 && n < 4), s"still fragmented: $after")
    val rowsAfter = spark.read.parquet(s"$dir/raw")
      .drop("p_date").collect().map(_.toString).sorted.toSeq
    assert(rowsAfter === rowsBefore, "compaction changed the data")
    // a compacted file keeps the sort contract (event_type, ts)
    val oneFile = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/raw/p_date=*/part-*"))
      .head.getPath.toString
    val inFile = spark.read.parquet(oneFile)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
    assert(inFile === inFile.sortBy(r => (r._1, r._2)), "within-file sort lost")
    // second pass: nothing left over the threshold
    assert(TableManager.compactDates(spark, s"$dir/raw",
      sortCols = Seq("event_type", "ts"), maxFiles = 2).isEmpty)
  }

  test("compactDates leaves partitions alone when their files are already target-sized") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_big").toString
    val ev = Tables.events(spark, sfDir)
    for (_ <- 1 to 4)
      TableManager.writePartitioned(ev, s"$dir/raw", "ts",
        sortCols = Seq("event_type", "ts"),
        mode = org.apache.spark.sql.SaveMode.Append)
    // with a tiny targetBytes every data file counts as full-size, so
    // a date that legitimately needs more than maxFiles such files
    // must NOT be rewritten on every maintenance pass — only SMALL
    // files (< targetBytes/2) trigger compaction
    assert(TableManager.compactDates(spark, s"$dir/raw",
      sortCols = Seq("event_type", "ts"), maxFiles = 2,
      targetBytes = 64L).isEmpty)
  }

  test("writePartitioned files are genuinely sorted by sortCols — even from parquet-sourced, pre-scrambled input") {
    // the regression this pins: a dynamic-partition write whose
    // declared ordering does not LEAD with the partition column gets
    // Spark's own non-stable sort-by-partition-col inserted on top,
    // which silently scrambles the within-file sortCols order (it
    // reproduced with parquet-sourced inputs; in-memory ranges often
    // got lucky). The layout IS the pruning contract — so read every
    // written file back and assert the order, not just the plan.
    val src = java.nio.file.Files.createTempDirectory("graft_sortsrc").toString
    (0L until 4000L)
      .map(i => (i, java.sql.Timestamp.valueOf(
        s"2024-01-0${(i % 3) + 1} 10:0${i % 6}:00"), i % 97))
      .toDF("event_id", "ts", "k")
      .write.mode("overwrite").parquet(src)
    val scrambled = spark.read.parquet(src).repartition(8)
    val out = java.nio.file.Files.createTempDirectory("graft_sortout").toString
    TableManager.writePartitioned(scrambled, out, "ts", Seq("k", "event_id"))
    val dirs = new java.io.File(out).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("p_date="))
    assert(dirs.length === 3)
    for (d <- dirs; f <- d.listFiles if f.getName.endsWith(".parquet")) {
      val rows = spark.read.parquet(f.toString)
        .select(col("k"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows === rows.sorted,
        s"${f.getName} in ${d.getName} not sorted by (k, event_id)")
      assert(rows.nonEmpty)
    }
  }

  test("bucketed fact tables join with zero shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    TableManager.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "b_lineitem", s"$dir/b_lineitem", "l_orderkey", 8)
    TableManager.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
      "b_orders", s"$dir/b_orders", "o_orderkey", 8)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      j.collect()
      val finalPlan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the join itself must need no exchange — only the small
      // post-join groupBy may shuffle.
      val joinSection = finalPlan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), finalPlan)
      assert(!joinSection.contains("Exchange"), "bucketed join must not shuffle\n" + finalPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
