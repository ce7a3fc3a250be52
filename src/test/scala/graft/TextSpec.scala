package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Token-array helpers behind the text-analysis family: shingles and
  * bigrams from a materialized token column (edge cases explode can't
  * surface once exploded: short docs, repeats).
  */
class TextSpec extends SparkSuite {
  import spark.implicits._

  test("bigramsFromTokens keeps multiplicity and empties short docs") {
    val df = Seq(
      (1L, "a b c a b"),
      (2L, "x"),
      (3L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Text.bigramsFromTokens(col("toks")).as("bg"))
    val rows = df.select(col("doc_id"), expr("transform(bg, s -> s.w1 || ' ' || s.w2)"))
      .as[(Long, Seq[String])].collect().toMap
    // "a b" appears TWICE — collocation counts need occurrences,
    // not the distinct sets shingles build
    assert(rows(1L) === Seq("a b", "b c", "c a", "a b"))
    assert(rows(2L) === Seq.empty)
    assert(rows(3L) === Seq.empty)
  }

  test("shinglesFromTokens distincts within doc and matches shingles(text)") {
    val df = Seq((1L, "a b c a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val viaTokens = df
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Text.shinglesFromTokens(col("toks"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val viaText = df
      .select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaTokens === viaText)
    // "a b c" occurs twice in doc 1 but the DISTINCT set keeps one
    assert(viaTokens(1L).sorted === Seq("a b c", "b c a", "b c d", "c a b").sorted)
    assert(viaTokens(2L) === Seq.empty) // shorter than n
  }

  test("collocations rank by the exact PMI ratio with deterministic ties") {
    // 30x "p q" (rare pair of rare words) must out-rank 30x "t u"
    // when t/u also appear apart (denominator grows)
    val docs = (
      (1L to 30L).map(i => (i, "p q")) ++
      (31L to 60L).map(i => (i, "t u")) ++
      (61L to 80L).map(i => (i, "t z u"))).toSeq
    val got = graft.queries.DocQueries.collocations(docs.toDF("doc_id", "text"))
      .as[(String, String, Long)].collect().toSeq
    assert(got.head === (("p", "q", 30L)))
    assert(got.map(r => (r._1, r._2)).contains(("t", "u")))
  }
}
