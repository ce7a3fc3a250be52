package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Sparse lexical retrieval — ranked search over a document corpus
  * via a term-postings inverted index, the BM25/TF-IDF-shaped
  * complement to the dense-ANN family ([[Ann]]): queries and corpus
  * meet on an equi-join over terms, never pairwise.
  *
  * Scoring is the integer-exact TF-IDF variant: each term's inverse
  * document frequency is the INTEGER division (N·idfScale)/df — rare
  * terms score high, stopword-ish terms collapse toward idfScale —
  * and a document's score for a query is Σ_t qtf·tf·idf over shared
  * terms. Every number is integer arithmetic two engines compute
  * bit-identically (the repo-wide exactness policy: no FP log-idf
  * whose last-ulp and summation order could flip a rank); the gate
  * hash-checks ranked results against a DuckDB recompute. Ties break
  * to the lower doc id.
  *
  * Scale shape: term frequencies are one map-side-combining groupBy
  * of the exploded corpus; document frequencies are a second k·|vocab|
  * aggregate joined back by term (vocab outgrows broadcast at corpus
  * scale, so this is a shuffle join ON THE TERM KEY — the classic
  * postings-sharded layout); the query side is tiny and broadcasts.
  * Scores sum as DECIMAL(38,0): qtf·tf·idf addends reach ~2^80 at
  * web-corpus N, past BIGINT. The final per-query rank plans as
  * WindowGroupLimit (bounded per-query state). The corpus size N is
  * the only driver scalar — one count, same bounded-metadata class
  * as a centroid codebook.
  */
object SparseSearch {

  /** Term-frequency postings (doc_id, tok, tf) of whitespace tokens. */
  def termPostings(corpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k corpus docs per query doc, ranked by Σ qtf·tf·idf with
    * idf = (N·idfScale) div df. Self-matches are excluded. Output:
    * (query_id, doc_id, rank).
    *
    * Deliberately uncached: the corpus is tokenized twice (df pass +
    * scoring pass) rather than holding a persisted postings copy
    * whose lifecycle a lazy return value can't manage. Repeated
    * retrieval over the same corpus should go through the
    * materialized [[graft.serving.SearchIndex]], which stores the
    * postings once.
    */
  def rankedRetrieval(corpus: DataFrame, queryIds: Seq[Long], k: Int,
      idfScale: Long = 10000L): DataFrame = {
    val post = termPostings(corpus)
    val n = corpus.count()
    val idf = post.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", expr(s"${n * idfScale} div df"))
    // query postings from the pre-filtered corpus: the id filter sits
    // below the explode instead of scanning full postings
    val q = termPostings(corpus.filter(col("doc_id").isInCollection(queryIds)))
      .select(col("doc_id").as("query_id"), col("tok"), col("tf").as("qtf"))
    val scored = post.join(broadcast(q), "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .join(idf, "tok")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum((col("qtf") * col("tf")).cast("decimal(38,0)") * col("idf"))
        .as("score"))
    TopK.topKPerKey(scored, Seq("query_id"),
        Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank"))
  }
}
