package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk shard packing — the LLM-pretraining step that
  * lays documents end-to-end in a deterministic order and cuts the
  * token stream into fixed-budget chunks (context windows / output
  * shards). Each doc gets its global token start offset and the chunk
  * its first token lands in.
  *
  * The naive formulation is a global-order running sum — a window
  * over ONE partition, which serializes the whole corpus through a
  * single task at 100 TB. This implementation is the classic
  * distributed exclusive scan instead:
  *
  *  1. range-partition by the order key (so partition i holds a
  *     contiguous id range, ranges ascending with partition id);
  *  2. one pass computes per-partition token totals — a bounded
  *     driver fetch of numPartitions rows (index metadata, not data);
  *  3. each partition then cumsums locally and adds its exclusive
  *     prefix offset, joined back in via a broadcast of the tiny
  *     offset table.
  *
  * Two narrow passes over the data, no global sort, no single-task
  * bottleneck — and bit-identical to the sequential definition the
  * DuckDB oracle computes with a plain window cumsum.
  */
object Pack {

  /** (idCol, tokenCol) -> (doc_id, n_tokens, start_offset, chunk).
    * `budget` = tokens per chunk; docs may straddle a boundary (the
    * concat-and-chunk convention: sequences are concatenated, then
    * cut every `budget` tokens).
    *
    * `orderBy` overrides the packing order (default: idCol ascending)
    * — pass a hash of the id for a DETERMINISTIC GLOBAL SHUFFLE of
    * the corpus (the training-order randomization step), at the same
    * two-narrow-pass cost: the range partitioner just ranges over the
    * hash instead of the id. Ties in the key fall back to doc_id, so
    * any expression yields a total order.
    */
  def packOffsets(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, partitions: Int = 0,
      orderBy: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = docs
      .select(col(idCol).as("doc_id"), col(tokenCol).cast("long").as("n_tokens"),
        orderBy.getOrElse(col(idCol)).as("_ord"))
      .repartitionByRange(nParts, col("_ord"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded driver metadata: one (pid, token total) row per partition
      val totals = ranged.groupBy(col("pid"))
        .agg(sum(col("n_tokens")).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until nParts).scanLeft(0L) {
        (acc, pid) => acc + totals.getOrElse(pid, 0L)
      }
      // One map-literal lookup, not a when-chain: a fold of nested
      // when(pid === i, …) builds an O(nParts)-deep expression tree
      // that stalls codegen at realistic shuffle-partition counts
      // (2000+); a MapType literal is a single constant whatever
      // nParts is (same fix as Rank.withGlobalRowNumber).
      val offsetCol = element_at(
        typedLit((0 until nParts).map(pid => pid -> offsets(pid)).toMap),
        col("pid"))
      val w = Window.partitionBy(col("pid")).orderBy(col("_ord"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ranged
        .withColumn("start_offset",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offsetCol)
        // integer DIV: exact at any offset magnitude (a double divide
        // would lose exactness past 2^53 tokens)
        .withColumn("chunk", expr(s"start_offset DIV $budget"))
        .select(col("doc_id"), col("n_tokens"), col("start_offset"), col("chunk"))
        .localCheckpoint(true)
    } finally { ranged.unpersist(); () }
  }
}
