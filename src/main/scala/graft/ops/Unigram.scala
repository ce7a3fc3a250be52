package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed UNIGRAM-LM tokenizer training and encoding — the
  * SentencePiece-unigram sibling of [[Bpe]] (Kudo ACL'18): instead of
  * greedy merges, a piece VOCABULARY with probabilities is estimated
  * by EM over the corpus, and words segment by Viterbi into the
  * maximum-likelihood piece sequence. Spark-first, with the same
  * scale shape as BPE:
  *
  *  - The corpus is read ONCE and collapsed to the bounded
  *    word-frequency table ([[Bpe.wordFreqs]]); every EM round is a
  *    couple of aggregates over that table, never a corpus re-scan.
  *  - The vocabulary is bounded driver metadata (all observed single
  *    characters + the top `pieces` multi-character substrings — the
  *    centroid-codebook class), so segmentation embeds it as a MAP
  *    literal and runs as a pure row-local expression: no join, no
  *    shuffle, whole corpus encoded in one map-side pass.
  *  - EM here is the hard (Viterbi) variant: the E-step segments
  *    every word under the current piece costs, the M-step recounts
  *    piece usage frequency-weighted and re-derives costs. Hard EM
  *    keeps every number INTEGER (see below), which is what lets the
  *    gate hash-check the result against an independently-trained
  *    DuckDB oracle, the [[Bpe.trainMerges]] determinism story.
  *
  * Integer arithmetic: a piece's cost is ilog(T) − ilog(cnt) — a
  * fixed-point log2 with 64 sub-steps per octave,
  * `ilog(c) = 64·B + ((c − 2^B)·64) div 2^B` for `B = ⌊log2 c⌋`
  * (computed from the binary-string length, so both engines agree
  * bit-for-bit; no floating point anywhere). Viterbi minimizes
  * (total cost, piece count, piece sequence) lexicographically —
  * a total order, so ties are deterministic across engines and
  * partitionings.
  */
object Unigram {

  /** Max piece length considered (census fan-out bound). */
  val MaxPiece = 4

  /** Learned multi-character vocabulary size (driver metadata). */
  val Pieces = 16

  /** Hard-EM rounds after seeding. */
  val Rounds = 2

  /** Piece costs + the unknown-single-char fallback cost. */
  final case class Vocab(costs: Map[String, Long], unk: Long)

  /** Fixed-point integer log2 (64 sub-steps per octave) — exact and
    * engine-agnostic; monotone in `c`, 0 at c = 1.
    */
  def ilog(c: Long): Long = {
    require(c >= 1, s"ilog of $c")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(c)
    64L * b + ((c - (1L << b)) * 64L) / (1L << b)
  }

  /** Frequency-weighted substring census over the word table:
    * (p, cnt) for every substring of length 1..MaxPiece, overlapping
    * occurrences counted — the seed-vocabulary statistic.
    */
  def census(wf: DataFrame): DataFrame =
    wf.select(col("wd"), col("freq"),
        explode(sequence(lit(1), length(col("wd")))).as("i"))
      .select(col("freq"), explode(transform(
          sequence(lit(1), least(lit(MaxPiece), length(col("wd")) - col("i") + 1)),
          l => col("wd").substr(col("i"), l))).as("p"))
      .groupBy(col("p"))
      .agg(sum(col("freq")).as("cnt"))

  private def toCosts(counts: Map[String, Long]): Vocab = {
    val t = counts.valuesIterator.sum
    Vocab(counts.map { case (p, c) => p -> (ilog(t) - ilog(c)) }, ilog(t))
  }

  /** Unit separator joining the piece sequence inside the DP state —
    * a single flat string instead of a nested array, so the struct
    * comparison (c, np, ps) is a cheap string compare and BOTH
    * engines order tied candidates identically (the joined string IS
    * the deterministic tie-break; it only has to be the same total
    * order on both sides, not array order).
    */
  val Sep = ""

  /** The Viterbi segmentation of `wd` under vocab `v`: a
    * struct(c, np, ps) column — total cost, piece count, and the
    * `Sep`-joined piece sequence (leading separator). Pure expression
    * (HOF fold over positions, MAP literal lookup), so encoding is
    * row-local at any corpus size. Single characters absent from the
    * vocabulary cost `v.unk` (count-1 smoothing), which guarantees
    * every word segments.
    */
  def viterbi(wd: Column, v: Vocab): Column = {
    val m =
      if (v.costs.isEmpty) map_from_arrays(
        array().cast("array<string>"), array().cast("array<bigint>"))
      else map(v.costs.toSeq.sortBy(_._1)
        .flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)
    val init = array(struct(
      lit(0L).as("c"), lit(0L).as("np"), lit("").as("ps")))
    val folded = aggregate(
      sequence(lit(1), length(wd)),
      init,
      (st, j) => concat(st, array(array_min(filter(
        transform(
          sequence(greatest(lit(1), j - lit(MaxPiece - 1)), j),
          i0 => {
            val piece = wd.substr(i0, j - i0 + lit(1))
            val prev = element_at(st, i0)
            struct(
              (prev.getField("c") + coalesce(element_at(m, piece),
                when(j === i0, lit(v.unk)))).as("c"),
              (prev.getField("np") + lit(1L)).as("np"),
              concat(prev.getField("ps"), lit(Sep), piece).as("ps"))
          }),
        s => s.getField("c").isNotNull)))))
    element_at(folded, length(wd) + lit(1))
  }

  /** The piece ARRAY of a [[viterbi]] result (drops the leading
    * separator and splits).
    */
  def piecesOf(best: Column): Column =
    split(best.getField("ps").substr(lit(2), length(best.getField("ps"))), Sep)

  /** Train the vocabulary: seed from the census (all single chars +
    * top-`Pieces` multi-char substrings by (cnt desc, p asc)), then
    * `Rounds` hard-EM updates — segment the word table, recount piece
    * usage frequency-weighted, drop unused multi-char pieces, keep
    * single chars with count-1 smoothing. Each round collects only
    * the bounded vocabulary's usage rows (driver metadata).
    */
  def train(docs: DataFrame, textCol: String = "text"): Vocab =
    trainFromWordFreqs(Bpe.wordFreqs(docs, textCol))

  /** [[train]] from an existing (wd, freq) word-frequency table —
    * the seam a continuously-maintained census
    * ([[graft.streaming.VocabIngest.readWordFreqs]]) trains through:
    * the census is additive and order-independent, so a streamed
    * census equals the batch one and the trained vocabulary is
    * identical.
    */
  def trainFromWordFreqs(wordFreqs: DataFrame): Vocab = {
    val wf = wordFreqs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cen = census(wf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val chars = cen.filter(length(col("p")) === 1)
        .collect().map(r => r.getAs[String]("p") -> r.getAs[Long]("cnt"))
      val multi = cen.filter(length(col("p")) >= 2)
        .orderBy(col("cnt").desc, col("p").asc).limit(Pieces)
        .collect().map(r => r.getAs[String]("p") -> r.getAs[Long]("cnt"))
      cen.unpersist(blocking = false)
      var counts: Map[String, Long] = (chars ++ multi).toMap
      for (_ <- 1 to Rounds) {
        val v = toCosts(counts)
        val usage = wf
          .withColumn("best", viterbi(col("wd"), v))
          .select(col("freq"), explode(piecesOf(col("best"))).as("p"))
          .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
          .collect().map(r => r.getAs[String]("p") -> r.getAs[Long]("cnt")).toMap
        counts = counts.flatMap { case (p, _) =>
          val u = usage.getOrElse(p, 0L)
          if (p.length == 1) Some(p -> math.max(u, 1L))
          else if (u >= 1L) Some(p -> u)
          else None
        }
      }
      toCosts(counts)
    } finally wf.unpersist(blocking = false)
  }

  /** Encode documents under a trained vocabulary: (doc_id, n_pieces,
    * head) — total Viterbi piece count plus the first `headN` pieces
    * joined by `|` in document word order ([[Bpe.encode]]'s output
    * shape). Each DISTINCT word segments once; occurrences join back
    * by word.
    */
  def encode(docs: DataFrame, v: Vocab,
      idCol: String = "doc_id", textCol: String = "text",
      headN: Int = 5): DataFrame = {
    val words = docs.select(
        col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "wd")))
      .filter(col("wd") =!= "")
    val seg = words.select(col("wd")).distinct()
      .withColumn("best", viterbi(col("wd"), v))
      .select(col("wd"), col("best.np").as("np"),
        piecesOf(col("best")).as("ps"))
    val agg = words.join(seg, Seq("wd"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("np")).as("n_pieces"),
        array_sort(collect_list(struct(col("pos"), col("ps")))).as("wp"))
      .select(col("doc_id"), col("n_pieces"),
        array_join(slice(flatten(col("wp.ps")), 1, headN), "|").as("head"))
    docs.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("head"), lit("")).as("head"))
  }
}
