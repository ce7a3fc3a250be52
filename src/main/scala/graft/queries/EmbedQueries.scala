package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Ann

/** Similarity-search queries over the `embeddings` table
  * (array<float> 64-dim vectors + cluster label).
  *
  * Outputs carry ids and ranks only — cosine values themselves never
  * leave the engine, so float representation differences between
  * engines can't break the hash compare (ordering is the only shared
  * contract, and the corpus has clear similarity gaps).
  */
object EmbedQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Exact brute-force cosine top-5 neighbors for query rows
    * (vec_id < 10). The baseline ANN oracle.
    */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Ann.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Seq[Double]]]

  /** IVF approximate top-5 for the same queries (16 cells, probe 4) —
    * the 100 TB scale path. No SQL oracle (approximate by design);
    * recall vs brute force is asserted in ScalaTest. Centroids (16
    * bounded driver rows — index metadata, like a real IVF index's
    * coarse quantizer) are cached per dataset so serving calls skip
    * the training job.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = centroidCache.getOrElseUpdate(dir,
      Ann.coarseCentroids(emb, nCells = 16))
    Ann.ivfKnn(emb, emb.filter(col("vec_id") < 10), k = 5,
      centroids = centroids, nprobe = 4)
  }

  /** Global top-20 most-similar embedding pairs (embedding-cosine
    * near-dup detection in ranked form).
    */
  def topPairs(spark: SparkSession, dir: String): DataFrame =
    Ann.topSimilarPairs(Tables.embeddings(spark, dir), topN = 20)

  /** Embedding-cosine near-dup pair set at threshold 0.4 (the corpus
    * has no pairs above ~0.51, so 0.4 exercises a real tail).
    */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Ann.cosineNearDupPairs(Tables.embeddings(spark, dir), threshold = 0.4)

  val queries: Map[String, QFn] = Map(
    "q_embed_knn" -> (knnBruteForce _),
    "q_embed_knn_ivf" -> (knnIvf _),
    "q_embed_top_pairs" -> (topPairs _),
    "q_embed_near_dup" -> (nearDupPairs _),
  )

  val oracles: Map[String, String] = Map(
    "q_embed_knn" ->
      """SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id ASC) AS rnk
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |WHERE rnk <= 5""".stripMargin,
    "q_embed_top_pairs" ->
      """SELECT CAST(row_number() OVER (ORDER BY sim DESC, id_a ASC, id_b ASC) AS BIGINT) AS rank,
        |  id_a, id_b FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |ORDER BY sim DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin,
    "q_embed_near_dup" ->
      """SELECT id_a, id_b FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |WHERE sim >= 0.4""".stripMargin,
  )
}
