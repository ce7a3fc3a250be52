package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table management — the Spark-side equivalent of the
  * reference's Pinot serving-layer layout (SURVEY §2.8):
  *
  *  - sorted column for locality/pruning (orders_raw_upsert_table
  *    .json:21-24) → `sortWithinPartitions` before write, so parquet
  *    row-group min/max stats prune on the dominant predicate;
  *  - date partitioning → directory-level partition pruning (the
  *    range-index analog, :32-34);
  *  - bloom filter on the PK (:35-38) → parquet bloom filters, used
  *    by the reader for point lookups;
  *  - 7/30-day retention (:12-13) → partition-drop sweep;
  *  - hourly MergeRollupTask (:72-84) → compaction rewrite.
  *
  * At 100 TB these write-layout decisions are what keep serving
  * queries index-like: a (date, sorted-key) layout means a top-K
  * lookup touches one partition directory and a few row groups, not
  * the table.
  */
object TableManager {

  /** Bloom-filter writer options for `bloomCol`, shared by every
    * layout writer. Adaptive sizing: parquet builds several candidate
    * filters and keeps the smallest that fits the ACTUAL per-row-group
    * NDV; expected.ndv only caps the largest candidate. Without it a
    * 240-row ranked file carries the same ~1 MB filter as a 2M-row raw
    * file (measured: the topk serving tables were 31 MB for 7 200
    * rows — 43x their data — all bloom padding).
    */
  private def withBloom(writer: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      bloomCol: Option[String]) =
    bloomCol.fold(writer) { c =>
      writer
        .option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.adaptive.enabled", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", "1000000")
    }

  /** Write `df` date-partitioned on `tsCol`'s date, sorted inside
    * each file by `sortCols`, with a parquet bloom filter on
    * `bloomCol`. `repartition(date, bucketExpr)` keeps one shuffle
    * and co-locates each date's rows before the sort.
    *
    * The sort LEADS with the partition column: a dynamic-partition
    * write REQUIRES its input ordered by the partition columns, and
    * when the declared ordering doesn't satisfy that, Spark inserts
    * its own sort by (p_date) alone — which is NOT stable and can
    * silently scramble the within-file `sortCols` order (observed:
    * parquet-sourced inputs came out unsorted; EraseStageSpec pins
    * the layout). Leading with p_date satisfies the requirement, so
    * no sort is inserted and the layout is guaranteed; within one
    * date value the leading key is constant, so files are still
    * sorted by `sortCols`.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      tsCol: String,
      sortCols: Seq[String],
      bloomCol: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val dated = df.withColumn("p_date", to_date(col(tsCol)))
    val writer0 = dated
      .repartition(col("p_date"))
      .sortWithinPartitions(("p_date" +: sortCols).map(col): _*)
      .write
      .mode(mode)
      .partitionBy("p_date")
    withBloom(writer0, bloomCol).parquet(path)
  }

  /** Overwrite ONLY the date partitions present in `df` (dynamic
    * partition overwrite), leaving all other dates untouched — the
    * incremental-refresh twin of [[writePartitioned]]. Same layout:
    * one shuffle to co-locate each date, sorted files, optional bloom.
    */
  def overwritePartitions(
      df: DataFrame,
      path: String,
      tsCol: String,
      sortCols: Seq[String],
      bloomCol: Option[String] = None): Unit = {
    val dated = df.withColumn("p_date", to_date(col(tsCol)))
    val writer0 = dated
      .repartition(col("p_date"))
      // leading p_date: see writePartitioned's inserted-sort note
      .sortWithinPartitions(("p_date" +: sortCols).map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p_date")
    withBloom(writer0, bloomCol).parquet(path)
  }

  /** Targeted user erasure from a raw partitioned store — the
    * right-to-be-forgotten twin of [[graft.serving.Serving.eraseUser]]
    * at the raw-table layer: one pruned columnar scan finds the date
    * partitions holding the user, ONLY those rewrite without the
    * user's rows (same sort + bloom layout as [[writePartitioned]]),
    * and a partition whose every row belonged to the user is dropped
    * directory-level. Untouched dates are neither read nor written.
    * The rewrite rides [[graft.serving.EraseStage]]'s staged commit
    * (kept rows durable + atomic manifest BEFORE the directory
    * drops), so a crash mid-erase — which used to leave rewritten
    * dates next to stale sole-owner directories — recovers to the
    * complete erase. Returns the affected p_date strings.
    */
  def eraseUser(
      spark: SparkSession,
      path: String,
      tsCol: String,
      sortCols: Seq[String],
      userCol: String,
      userId: Long,
      bloomCol: Option[String] = None): Seq[String] = {
    graft.serving.EraseStage.recover(spark, path)
    val t = spark.read.parquet(path)
    val dates = t.filter(col(userCol) === userId)
      .select(col("p_date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (dates.isEmpty) Nil
    else {
      // p_date stays a data column in the staged files; apply()
      // re-extracts it as the partition column on the rewrite
      val kept = t
        .filter(col("p_date").cast("string").isin(dates: _*) &&
          col(userCol) =!= userId)
        .localCheckpoint(true)
      try {
        graft.serving.EraseStage.run(spark, path, Seq(
          graft.serving.EraseStage.Swap("", "p_date", dates, sortCols,
            bloomCol.map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap)
            -> kept))
      } finally { kept.unpersist(); () }
      dates
    }
  }

  /** Drop date partitions older than `retentionDays` relative to
    * `nowDate` (yyyy-MM-dd) — the Pinot retention-manager analog.
    * Purely directory-level: no data files are read.
    */
  def retentionSweep(spark: SparkSession, path: String, retentionDays: Int, nowDate: String): Seq[String] = {
    val cutoff = java.time.LocalDate.parse(nowDate).minusDays(retentionDays.toLong)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dropped = Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/p_date=*")))
      .getOrElse(Array.empty)
      .toSeq
      .filter { st =>
        val d = st.getPath.getName.stripPrefix("p_date=")
        scala.util.Try(java.time.LocalDate.parse(d).isBefore(cutoff)).getOrElse(false)
      }
    dropped.foreach(st => fs.delete(st.getPath, true))
    dropped.map(_.getPath.getName)
  }

  /** Rewrite date partitions that accumulated more than `maxFiles`
    * SMALL data files (< targetBytes/2 — files already at target size
    * don't count, so a partition that legitimately needs many
    * full-size files is not rewritten over and over on every
    * maintenance pass; compaction converges and a second pass is a
    * no-op) into ~`targetBytes` files — the file-grain
    * maintenance twin of [[compactRollupSegments]] (Pinot's
    * MergeRollupTask merges segments; a Structured Streaming file
    * sink writes one file per micro-batch per partition, so a
    * 10-second trigger leaves ~8.6k files/day/partition behind and
    * every read pays that many opens + footer parses). Only the
    * oversized partitions are read or rewritten; rows are re-sorted
    * by `sortCols` inside each output file and the bloom filter
    * rewritten, so the compacted layout keeps the exact pruning
    * contract of [[writePartitioned]]. `repartitionByRange` over
    * (p_date, sortCols) gives each date contiguous sorted chunks with
    * file counts proportional to its bytes — one global shuffle of
    * just the compacted dates. Dynamic partition overwrite swaps each
    * date at job commit; a crash mid-job leaves the original files
    * untouched (output stages in the job's temporary directory).
    * Returns the rewritten partition directory names.
    */
  def compactDates(
      spark: SparkSession,
      path: String,
      sortCols: Seq[String],
      bloomCol: Option[String] = None,
      maxFiles: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/p_date=*")))
      .getOrElse(Array.empty).toSeq.filter(_.isDirectory)
    def dataFiles(p: org.apache.hadoop.fs.FileStatus) =
      fs.listStatus(p.getPath).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
    val todo = parts.map(p => p -> dataFiles(p))
      .filter(_._2.count(_.getLen < targetBytes / 2) > maxFiles)
    if (todo.isEmpty) Nil
    else {
      val bytes = todo.flatMap(_._2).map(_.getLen).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val df = spark.read
        .option("basePath", path)
        .parquet(todo.map(_._1.getPath.toString): _*)
      val keys = (col("p_date") +: sortCols.map(col))
      val writer0 = df
        .repartitionByRange(nOut, keys: _*)
        .sortWithinPartitions(keys: _*)
        .write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_date")
      withBloom(writer0, bloomCol).parquet(path)
      todo.map(_._1.getPath.getName)
    }
  }

  /** Write a table bucketed (and sorted) by its recurring join key.
    * Both sides of a repeated fact-fact equi-join written this way
    * join with ZERO exchange: each bucket pair is already co-located
    * and pre-sorted, so the sort-merge join starts immediately — the
    * 100 TB answer to "this join shuffles 100 TB every night". Bucket
    * count should be sized to cluster parallelism (it fixes the join's
    * task count). Registered in the session catalog (bucketing
    * metadata lives there), data at `path`.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Compact a segmented (batch_id-partitioned) streaming rollup
    * table into one row per (window, dims) at `outPath` — the
    * maintenance twin of StreamingPipeline's per-batch segment
    * appends (Pinot MergeRollupTask at segment grain; sketches merge
    * losslessly). Bounds segment count at scale: without it a
    * 10-second trigger accumulates ~8.6k segments/day.
    */
  def compactRollupSegments(
      spark: SparkSession,
      rollupPath: String,
      outPath: String,
      dims: Seq[String] = Seq("event_type")): Unit =
    graft.ops.Rollup.compactSegments(spark.read.parquet(rollupPath), dims)
      .withColumn("p_date", to_date(timestamp_millis(col("window_start_ms"))))
      .repartition(col("p_date"))
      // leading p_date: see writePartitioned's inserted-sort note
      .sortWithinPartitions(("p_date" +: dims :+ "window_start_ms").map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("p_date").parquet(outPath)

  /** Compact a 1-minute rollup table into its hourly form in place
    * of older partitions (MergeRollupTask semantics: re-sum metrics;
    * caller re-merges HLL sketches when carried).
    */
  def compactToHourly(
      spark: SparkSession,
      rollupPath: String,
      outPath: String,
      dims: Seq[String]): Unit = {
    val rollup = spark.read.parquet(rollupPath)
    graft.ops.Rollup.compactHourly(rollup, dims)
      .withColumn("p_date", to_date(timestamp_millis(col("hour_start_ms"))))
      .repartition(col("p_date"))
      // leading p_date: see writePartitioned's inserted-sort note
      .sortWithinPartitions(("p_date" +: dims :+ "hour_start_ms").map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("p_date").parquet(outPath)
  }

  /** Morton/Z-value: bit-interleave of two bigint columns already
    * scaled to `[0, 2^bits)`. Pure shift/mask column arithmetic —
    * codegen'd, no UDF.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Z-order clustering write: cluster files along TWO dimensions at
    * once, so row-group/file min-max stats prune on either predicate
    * — the multi-dimensional upgrade of the single sorted column (a
    * user-sorted layout prunes user predicates perfectly and value
    * predicates not at all; the Z-curve gives each dimension
    * ~sqrt(nFiles) pruning power).
    *
    * The two columns are linearly rescaled to `[0, 2^bits)` using
    * their global min/max — a 4-value driver-side bound, the same
    * bounded-metadata class as broadcast thresholds. Rows then range-
    * partition and sort by the interleaved Z-value, giving each file
    * a compact 2-D extent. At 100 TB this is a full shuffle of the
    * written table — the standard one-off cost of any re-clustering
    * compaction, amortized over every subsequent pruned scan.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      bits: Int = 16,
      nFiles: Int = 32): Unit = {
    val b = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (b.isNullAt(0) || b.isNullAt(2)) { // empty input: nothing to cluster
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val (aLo, aHi) = (b.getDouble(0), b.getDouble(1))
    val (bLo, bHi) = (b.getDouble(2), b.getDouble(3))
    val maxCode = (1L << bits) - 1
    def scale(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(maxCode),
        ((c.cast("double") - lit(lo)) * lit(maxCode / (hi - lo))).cast("long"))
    df.withColumn("__z",
        zValue(scale(col(colA), aLo, aHi), scale(col(colB), bLo, bHi), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
