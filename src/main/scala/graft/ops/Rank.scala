package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — row_number / NTILE over a total
  * order WITHOUT the single-partition window Spark plans for
  * `Window.orderBy(...)` (which serializes the whole input through
  * one task; fine for 150 rows, fatal at 100 TB).
  *
  * Same exclusive-scan shape as [[Pack.packOffsets]]:
  *  1. `repartitionByRange` on the sort key — partition i holds a
  *     contiguous slice of the global order;
  *  2. per-partition row counts — a bounded driver fetch of
  *     numPartitions longs (index metadata, not data);
  *  3. per-partition row_number + the partition's exclusive offset.
  *
  * The result is independent of where the range boundaries land
  * because the sort must be a TOTAL order (pass tie-breaker columns;
  * with ties split across partitions the rank would be
  * boundary-dependent).
  */
object Rank {

  /** Global 1-based row_number by `sortCols` (a total order) in
    * column `out`. Two narrow passes, no global sort.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column], out: String = "rn",
      partitions: Int = 0): DataFrame = {
    val (ranked, _) = rankWithTotal(df, sortCols, out, partitions)
    ranked
  }

  /** SQL NTILE(n) by `sortCols` in column `out`: first (total % n)
    * buckets get one extra row — identical to the window-function
    * definition, computed from the distributed global rank.
    */
  def globalNtile(df: DataFrame, sortCols: Seq[Column], n: Int, out: String = "tile",
      partitions: Int = 0): DataFrame = {
    require(n > 0, s"ntile buckets must be positive, got $n")
    val (ranked, total) = rankWithTotal(df, sortCols, "_grn", partitions)
    ranked.withColumn(out,
        expr(s"CAST(${tileSql(total, n)} AS BIGINT)"))
      .drop("_grn")
  }

  /** NTILE arithmetic as SQL text over the `_grn` rank column —
    * integer DIV end-to-end (a double divide would round past 2^53).
    */
  private def tileSql(total: Long, n: Int): String = {
    val size = total / n
    val rem = total % n
    if (size == 0) "_grn"
    else {
      val cut = rem * (size + 1)
      s"CASE WHEN _grn <= $cut THEN (_grn - 1) DIV ${size + 1} + 1 " +
        s"ELSE $rem + (_grn - 1 - $cut) DIV $size + 1 END"
    }
  }

  private def rankWithTotal(df: DataFrame, sortCols: Seq[Column], out: String,
      partitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(nParts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until nParts).scanLeft(0L) {
        (acc, pid) => acc + counts.getOrElse(pid, 0L)
      }
      // One map-literal lookup, not a when-chain: a fold of nested
      // when(_pid === i, …) builds an O(nParts)-deep expression tree
      // that stalls codegen at realistic shuffle-partition counts
      // (2000+); a MapType literal is a single constant whatever
      // nParts is.
      val offsetCol = element_at(
        typedLit((0 until nParts).map(pid => pid -> offsets(pid)).toMap),
        col("_pid"))
      val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
      val ranked = ranged
        .withColumn(out, row_number().over(w).cast("long") + offsetCol)
        .drop("_pid")
        .localCheckpoint(true)
      (ranked, offsets.last)
    } finally { ranged.unpersist(); () }
  }
}
