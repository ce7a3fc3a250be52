package graft

import org.apache.spark.sql.functions._
import graft.ops.Unigram

/** Unigram-LM tokenizer ([[graft.ops.Unigram]]): the integer
  * fixed-point log, the Viterbi segmentation's optimality and
  * deterministic tie-break, and the hard-EM training loop's
  * vocabulary dynamics — the properties the cross-engine oracle gate
  * (q_doc_unigram_trained) relies on.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  test("ilog: exact at powers of two, monotone, 0 at 1") {
    assert(Unigram.ilog(1L) === 0L)
    for (k <- 1 to 40) assert(Unigram.ilog(1L << k) === 64L * k)
    // non-strictly monotone: 64 sub-steps per octave, so neighbors
    // inside a late octave can tie (ilog(1024) == ilog(1025))
    val samples = Seq(1L, 2L, 3L, 5L, 7L, 100L, 1023L, 1024L, 1025L, 1L << 40)
    samples.zip(samples.tail).foreach { case (a, b) =>
      assert(Unigram.ilog(a) <= Unigram.ilog(b), s"ilog not monotone at $a,$b") }
    assert(Unigram.ilog(1024L) === Unigram.ilog(1025L))
    assert(Unigram.ilog(7L) < Unigram.ilog(100L))
    // within-octave interpolation: 3 is half an octave above 2
    assert(Unigram.ilog(3L) === 64L + 32L)
  }

  test("viterbi: picks the min-cost segmentation with the (cost, count, sequence) tie-break") {
    // the hand fixture: ab+c+ab and ab+ca+b both cost 13 with 3
    // pieces — the sequence tie-break picks ab|c|ab ('c' < 'ca')
    val v = Unigram.Vocab(
      Map("a" -> 5L, "b" -> 6L, "c" -> 7L, "ab" -> 3L, "ca" -> 4L), unk = 99L)
    def seg(w: String): (Long, Long, Seq[String]) = {
      val r = Seq(w).toDF("wd")
        .select(Unigram.viterbi(col("wd"), v).as("b"))
        .select(col("b.c"), col("b.np"), Unigram.piecesOf(col("b")))
        .head()
      (r.getLong(0), r.getLong(1), r.getSeq[String](2))
    }
    assert(seg("abab") === ((6L, 2L, Seq("ab", "ab"))))
    assert(seg("abcab") === ((13L, 3L, Seq("ab", "c", "ab"))))
    // unknown single chars fall back to the unk cost, never fail
    assert(seg("zq") === ((198L, 2L, Seq("z", "q"))))
    assert(seg("a") === ((5L, 1L, Seq("a"))))
  }

  test("train + encode: learned pieces compress repeated substrings; totals consistent") {
    val docs = (0L until 40L).map(i => (i, "sparking sparkle respark"))
      .toDF("doc_id", "text")
    val v = Unigram.train(docs)
    // a dominant 4-gram of the repeated words must survive training
    // as a piece cheaper than its characters ('park' wins the census
    // tie against 'spar' lexicographically, then survives EM)
    assert(v.costs.contains("park"),
      s"expected 'park' in vocab, got ${v.costs.keys.toSeq.sorted}")
    val charCost = "park".map(c => v.costs(c.toString)).sum
    assert(v.costs("park") < charCost)
    val out = Unigram.encode(docs, v).collect()
    assert(out.length === 40)
    val chars = "sparking sparkle respark".count(_ != ' ')
    out.foreach { r =>
      val n = r.getAs[Long]("n_pieces")
      assert(n > 0 && n < chars, s"n_pieces $n not compressed vs $chars chars")
      assert(r.getAs[String]("head").nonEmpty)
    }
    // an empty doc survives encode with 0 pieces (the Bpe.encode rule)
    val withEmpty = docs.unionByName(Seq((99L, "")).toDF("doc_id", "text"))
    val e = Unigram.encode(withEmpty, v)
      .filter(col("doc_id") === 99L).head()
    assert(e.getAs[Long]("n_pieces") === 0L && e.getAs[String]("head") === "")
  }

  test("encode is a single map-side pass per distinct word: no corpus-wide shuffle of text") {
    val docs = Tables.documents(spark, sfDir)
    val v = Unigram.train(docs)
    val plan = Unigram.encode(docs, v).queryExecution.optimizedPlan.toString
    // the vocabulary rides as a literal, not a join against a vocab
    // relation — segmentation is row-local by construction
    assert(!plan.contains("vocab"), plan.take(800))
  }
}
