package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING and encoding —
  * the tokenizer-construction leg of a training-data pipeline
  * (Sennrich et al. ACL'16), expressed Spark-first:
  *
  *  - Training never touches the corpus per iteration: one pass
  *    collapses the corpus to the WORD-FREQUENCY table (the standard
  *    BPE trick — vocab-sized, bounded, ~10M rows at web scale vs
  *    trillions of corpus tokens), and every merge iteration is a
  *    pair-count aggregate over that bounded table. At 100 TB the
  *    corpus is read once; iterations cost O(vocab), not O(corpus).
  *  - The per-iteration argmax pair is ONE collected row (bounded
  *    driver metadata, the centroid-codebook class); the merge rule
  *    list itself is tokenizer metadata by definition.
  *  - Merging is the classic space-joined-symbols string rewrite:
  *    a word's symbol string ` a b c </w> ` merges pair (x, y) via
  *    the literal replace ` x y ` → ` xy ` — non-overlapping,
  *    leftmost-first, exactly BPE's simultaneous merge semantics —
  *    and chained literal `replace()`s are codegen'd row-local
  *    expressions both engines evaluate identically (no UDFs).
  *  - Encoding applies the ordered rule chain to each word and is
  *    pure expression too, so it runs inside whole-stage codegen at
  *    corpus scale and the gate hash-checks it against a DuckDB
  *    mirror of the same replace chain.
  *
  * Determinism: pair argmax ties break lexicographically (count
  * desc, then x asc, y asc) — reproducible across partitionings and
  * engines, which is what lets BpeSpec pin the trained rules against
  * an in-memory reference.
  */
object Bpe {

  /** End-of-word sentinel (keeps word-final merges distinct). */
  val Eow = "</w>"

  /** Corpus → (wd, freq): the bounded table training iterates on. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("wd"))
      .filter(col("wd") =!= "")
      .groupBy(col("wd"))
      .agg(count(lit(1)).as("freq"))

  /** SQL-expression source of a word's initial symbol string:
    * ` a b c </w> ` (leading/trailing spaces so every adjacent pair,
    * including the first, matches a ` x y ` literal).
    */
  private def symSql(wdCol: String): String =
    s"concat(' ', array_join(filter(split($wdCol, ''), s -> s != '')," +
      s" ' '), ' $Eow ')"

  /** Chain the ordered merge rules as literal replaces over a symbol
    * string SQL expression. Literal (non-regex) replace: the corpus
    * is whitespace-tokenized text, and merged symbols are plain
    * concatenations, so no escaping is needed — asserted below.
    */
  private def mergedSql(base: String, merges: Seq[(String, String)]): String = {
    merges.foreach { case (x, y) =>
      require(!(x + y).exists(c => c == '\'' || c == ' ' || c == '%'),
        s"merge symbols must be plain tokens, got ($x, $y)")
    }
    merges.foldLeft(base) { case (acc, (x, y)) =>
      s"replace($acc, ' $x $y ', ' ${x + y} ')"
    }
  }

  /** (wd, freq, syms) with `syms` the symbol ARRAY after applying
    * `merges` in order.
    */
  def symbolized(wf: DataFrame, merges: Seq[(String, String)]): DataFrame =
    wf.withColumn("syms",
      expr(s"split(trim(${mergedSql(symSql("wd"), merges)}), ' ')"))

  /** Frequency-weighted adjacent-pair counts over the symbolized
    * word table: (x, y, cnt). The ×(symbols−1) fan-out runs over the
    * bounded word table, and partial aggregation collapses it
    * map-side — the same plan class as any keyed count.
    */
  def pairCounts(sym: DataFrame): DataFrame =
    sym.select(col("freq"), explode(expr(
        "transform(slice(syms, 1, size(syms)-1)," +
          " (s, i) -> struct(s AS x, element_at(syms, i+2) AS y))")).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `n` merge rules: per iteration, the argmax pair (ONE
    * collected row) joins the rule list and the next iteration's
    * symbol table applies the longer chain. The word-freq table is
    * pinned for the loop and released after — an eager driver-side
    * training call, not a lazy query path.
    */
  def trainMerges(docs: DataFrame, n: Int, textCol: String = "text"): Seq[(String, String)] = {
    val wf = wordFreqs(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (1 to n).foldLeft(Seq.empty[(String, String)]) { (merges, _) =>
        val top = pairCounts(symbolized(wf, merges))
          .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
          .limit(1).collect()
        if (top.isEmpty) merges
        else merges :+ ((top(0).getAs[String]("x"), top(0).getAs[String]("y")))
      }
    } finally wf.unpersist(blocking = false)
  }

  /** [[trainMerges]] with per-iteration BATCHING: each Spark job
    * collects one sorted slice of the pair census and the driver
    * greedily accepts a PREFIX of rules from it, provably equal to
    * running the sequential argmax that many times — cutting driver
    * round-trips by the accepted-batch factor (the round-trip cost is
    * what dominates a 30k-merge vocabulary; the per-iteration compute
    * is already O(vocab)).
    *
    * Why the prefix rule is exact: after applying an accepted merge
    * (x, y), (a) pairs sharing no symbol with it keep their count
    * bit-exactly (the merge consumes only x/y tokens and cannot
    * create or destroy a disjoint adjacency), (b) pairs sharing a
    * symbol only DECREASE, and (c) every NEW pair involves the merged
    * symbol and its count is bounded by an original census row that
    * shares a symbol with (x, y). So the sorted census row r is
    * sequentially-next iff it is symbol-disjoint from everything
    * accepted AND no unaccepted census row with cnt >= r.cnt shares a
    * symbol with the accepted set (such a row could still outrank r
    * after the decrease, or bound a new pair that ties r and wins the
    * lexicographic tie-break). Both checks need only the collected
    * slice, provided the slice is known to contain EVERY row with
    * cnt >= r.cnt — hence acceptance stops at the slice's truncation
    * count. Any stop just ends the batch; the next job recounts and
    * the argmax restores exactness, so batching never changes the
    * rule sequence (BpeSpec pins batched == sequential).
    */
  def trainMergesBatched(docs: DataFrame, n: Int, batch: Int = 16,
      slice: Int = 256, textCol: String = "text"): Seq[(String, String)] = {
    val wf = wordFreqs(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.size < n && !exhausted) {
        val rows = pairCounts(symbolized(wf, merges))
          .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
          .limit(slice + 1).collect()
          .map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
            r.getAs[Long]("cnt")))
        if (rows.isEmpty) exhausted = true
        else {
          val truncated = rows.length > slice
          val cand = rows.take(slice)
          val minCnt = cand.last._3
          val syms = scala.collection.mutable.Set.empty[String]
          val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var stop = false
          for (r @ (x, y, c) <- cand if !stop) {
            if (accepted.isEmpty) { accepted += ((x, y)); syms += x; syms += y }
            else if (accepted.size >= batch || merges.size + accepted.size >= n)
              stop = true
            else if (truncated && c <= minCnt)
              stop = true // rows with cnt >= c may exist beyond the slice
            else if (syms(x) || syms(y))
              stop = true // r's own count may have decreased — recount
            else if (cand.exists { o =>
              o._3 >= c && (syms(o._1) || syms(o._2)) && !accepted.contains((o._1, o._2))
            })
              stop = true // a shared-symbol row could outrank r post-merge
            else { accepted += ((x, y)); syms += x; syms += y }
          }
          merges ++= accepted
        }
      }
      merges
    } finally wf.unpersist(blocking = false)
  }

  /** Encode documents with an ordered rule list: (doc_id, n_tokens,
    * head) — token count plus the first `headN` tokens joined by `|`
    * (corpus-order deterministic). Per-word token arrays are computed
    * by the same expression chain as training used, words re-assemble
    * in document order via a sorted struct collect.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text",
      headN: Int = 5): DataFrame = {
    val toksSql = s"split(trim(${mergedSql(symSql("wd"), merges)}), ' ')"
    val agg = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "wd")))
      .filter(col("wd") =!= "")
      .withColumn("toks", expr(toksSql))
      .groupBy(col("doc_id"))
      .agg(
        sum(size(col("toks"))).as("n_tokens"),
        array_sort(collect_list(struct(col("pos"), col("toks")))).as("wt"))
      .select(col("doc_id"), col("n_tokens"),
        array_join(slice(flatten(col("wt.toks")), 1, headN), "|").as("head"))
    // a wholly-empty document has no word rows and would vanish in
    // the groupBy; reinstate it as 0 tokens (the oracle's behavior)
    docs.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("head"), lit("")).as("head"))
  }
}
