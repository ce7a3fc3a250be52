package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget mixture allocation — the "build the training mixture"
  * step that turns per-source token quotas into an exact document
  * selection: each source contributes documents (in a deterministic
  * pseudo-random order) until its quota is filled, and a source whose
  * whole corpus is smaller than its quota is OVERSAMPLED — documents
  * repeat across epochs, up to a cap (the "small high-quality sources
  * get multiple epochs" convention of LLM pre-training mixtures;
  * cf. Gao et al. 2020 "The Pile", §2 epoch table, and Xie et al.
  * 2023 DoReMi's domain-weight resampling).
  *
  * Unlike [[Sample.mixtureSample]] (per-stratum Bernoulli keep-RATES,
  * which only approximate the budget in expectation), this is the
  * exact-quota form: the selected token mass per source lands in
  * [budget, budget + straddling doc) before the epoch cap, and every
  * decision is a pure function of (corpus, budgets), so membership
  * AND repeat counts are oracle-checkable.
  *
  * The running "tokens before this doc within my source" is a PER-KEY
  * exclusive prefix scan. A per-source window would serialize every
  * source through one task (a 30%-of-corpus source = a 30 TB task at
  * 100 TB); [[keyedExclusiveScan]] generalizes [[Pack.packOffsets]]'s
  * two-pass distributed scan to keyed form instead, with the same
  * bounded driver metadata.
  */
object Quota {

  /** Per-key exclusive running sum of `valCol` in (ordCols…, idCol)
    * order within each `keyCol` group, WITHOUT a per-key single-task
    * window: range-partition by (key, ord…, id) so each partition
    * holds a contiguous slice of the global (key, ord, id) order;
    * collect per-(partition, key) subtotals — a bounded driver fetch
    * of at most nParts + nKeys − 1 rows, since contiguous ranges mean
    * each key spans consecutive partitions — and give each partition
    * its per-key exclusive offset via one broadcast map literal; a
    * partition-local window finishes the scan. Two narrow passes, no
    * key-sized task, bit-equal to the sequential per-key cumsum the
    * oracle computes.
    *
    * `keyCol` must be string-typed and free of the `|` separator
    * (enforced); the result adds a `cum` column and is
    * `localCheckpoint`ed (spark_partition_id is not recompute-stable,
    * same contract as [[Pack.packOffsets]]).
    */
  def keyedExclusiveScan(df: DataFrame, keyCol: String, ordCols: Seq[String],
      idCol: String, valCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rangeCols = (keyCol +: ordCols :+ idCol).map(col)
    val ranged = df
      .repartitionByRange(nParts, rangeCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded driver metadata: one (pid, key, subtotal) row per
      // (partition, key) slice — ≤ nParts + nKeys − 1 under contiguity
      val subtotals = ranged.groupBy(col("_pid"), col(keyCol))
        .agg(sum(col(valCol)).as("_t"))
        .collect().map { r =>
          val k = r.getString(1)
          require(k != null,
            s"keyedExclusiveScan: null value in key column '$keyCol' — " +
              "filter or default null keys before the scan")
          require(!k.contains("|"), s"keyedExclusiveScan key contains '|': $k")
          (r.getInt(0), k) -> r.getLong(2)
        }
      // per (pid, key): sum of the SAME key's subtotals at smaller pid
      val offsets: Map[String, Long] = subtotals
        .groupBy(_._1._2)
        .flatMap { case (k, rows) =>
          val byPid = rows.sortBy(_._1._1)
          byPid.map(_._1._1)
            .zip(byPid.scanLeft(0L)(_ + _._2))
            .map { case (pid, off) => s"$pid|$k" -> off }
        }
      val offCol = coalesce(
        element_at(typedLit(offsets), concat_ws("|", col("_pid"), col(keyCol))),
        lit(0L))
      val w = Window.partitionBy(col("_pid"), col(keyCol))
        .orderBy((ordCols :+ idCol).map(col): _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      ranged
        .withColumn("cum", coalesce(sum(col(valCol)).over(w), lit(0L)) + offCol)
        .drop("_pid")
        .localCheckpoint(true)
    } finally { ranged.unpersist(); () }
  }

  /** Exact token-quota allocation with epoch oversampling:
    * (doc_id, source, n_tokens, n_epochs) for every SELECTED doc,
    * where n_epochs = min(budget DIV total + [cum < budget MOD total],
    * maxEpochs) — i.e. every doc of the source repeats once per full
    * epoch the quota buys, and the docs whose (deterministic-shuffle)
    * prefix position starts before the remainder get one partial-epoch
    * extra. The straddling doc is INCLUDED (quota is a floor), so
    * uncapped selected mass per source is in [budget, budget + that
    * doc); sources absent from `budgets` (or with quota 0, or with an
    * empty corpus) contribute nothing.
    *
    * Order within a source is `md5(seed:doc_id)` — the same
    * deterministic-global-shuffle convention as
    * [[Pack.packOffsets]]'s orderBy, so selection is an unbiased
    * fixed sample yet exactly reproducible by the oracle.
    *
    * Scale shape: one keyed scan (two narrow passes, above), one
    * tiny per-source totals broadcast, one broadcast budget-map
    * literal; the epoch arithmetic is a narrow projection. No
    * per-source task, no raw-text exchange (the scan carries only
    * id/source/ord/count).
    */
  def tokenBudget(docs: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, budgets: Map[String, Long], maxEpochs: Int = 4,
      seed: String = "quota1"): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val ordered = docs.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      col(tokensCol).cast("long").as("n_tokens"),
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("_ord"))
    val scanned = keyedExclusiveScan(ordered, "source", Seq("_ord"), "doc_id", "n_tokens")
    val totals = scanned.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("_total"))
    val budgetCol: Column =
      if (budgets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(budgets), col("source")), lit(0L))
    scanned
      .join(broadcast(totals), Seq("source"))
      .filter(col("_total") > 0)
      .withColumn("_b", budgetCol)
      .withColumn("n_epochs",
        least(
          expr("_b DIV _total")
            + when(col("cum") < expr("_b % _total"), lit(1L)).otherwise(lit(0L)),
          lit(maxEpochs.toLong)))
      .filter(col("n_epochs") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("n_epochs"))
  }

  /** Deterministic stride-scheduled interleave of a [[tokenBudget]]
    * allocation into ONE global training order: epoch-expand each
    * selected doc (one row per (doc, epoch)), rank rows within their
    * source by (epoch, md5 order, doc_id), place the r-th of a
    * source's n rows at position (2r+1)/(2n) — the classic stride /
    * lottery-scheduling interleave (Waldspurger & Weihl, OSDI '94),
    * which spreads every source evenly across the whole sequence
    * instead of concatenating corpora — and number the global
    * (pos, source, doc_id, epoch) order.
    *
    * Positions are single IEEE-double divisions of exactly
    * representable integers — bit-identical on any engine — and the
    * sort key carries full tie-breakers, so `seq` is a total order
    * the oracle reproduces exactly.
    *
    * Scale shape: the epoch expansion is a narrow generator (bounded
    * by the epoch cap); the within-source rank is
    * [[keyedExclusiveScan]] counting rows (no per-source task); the
    * per-source row counts are a tiny broadcast; the global numbering
    * is [[Rank.globalRowNumber]]'s two-pass range scan. Nothing wide
    * ever carries text — ids, epochs, and doubles only.
    */
  def strideInterleave(alloc: DataFrame, seed: String = "quota1"): DataFrame = {
    val ex = alloc
      .withColumn("epoch", explode(sequence(lit(0L), col("n_epochs") - 1)))
      .withColumn("_ord",
        md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))))
      .select(col("doc_id"), col("source"), col("epoch"), col("_ord"), lit(1L).as("_one"))
    val ranked = keyedExclusiveScan(ex, "source", Seq("epoch", "_ord"), "doc_id", "_one")
    val counts = ranked.groupBy(col("source")).agg(sum(col("_one")).as("_n"))
    Rank.globalRowNumber(
        ranked.join(broadcast(counts), Seq("source"))
          .withColumn("pos",
            (col("cum") * 2 + 1).cast("double") / (col("_n") * 2).cast("double")),
        Seq(col("pos"), col("source"), col("doc_id"), col("epoch")), out = "seq")
      .select(col("seq"), col("doc_id"), col("source"), col("epoch"))
  }
}
