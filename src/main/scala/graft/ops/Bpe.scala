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
