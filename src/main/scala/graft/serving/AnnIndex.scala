package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** MATERIALIZED IVF index — the serving-layer analog for embeddings,
  * mirroring how [[Serving]] materializes ranked event tables: the
  * corpus is written once as parquet PARTITIONED BY coarse-quantizer
  * cell (vectors pre-cast to double, norms precomputed), and each
  * query batch reads only the cell partitions it probes.
  *
  * Pruning is Spark-native: the probe side (queries × nprobe cells)
  * broadcast-joins the index on the `cell` partition column, and
  * DYNAMIC PARTITION PRUNING turns the broadcast's cell set into a
  * runtime partition filter on the scan — at nprobe << nlist a
  * 1000-cell index reads nprobe directories, not the corpus, without
  * any driver-side collect of the query batch. AnnIndexSpec asserts
  * the dynamic-pruning expression is present in the scan and that
  * files read scale with nprobe.
  *
  * Same ranked-merge tail as [[graft.ops.Ann.ivfKnn]] (per-query
  * window over candidates), so exhaustive probe (nprobe = nlist) is
  * bit-identical to brute force — which is what the gate hash-checks.
  */
object AnnIndex {

  /** Write the index: one parquet directory per cell. Rewriting an
    * existing root replaces it atomically per partition (overwrite).
    */
  def materialize(emb: DataFrame, centroids: Seq[Seq[Double]], root: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    emb.select(
        col(idCol).as("vec_id"),
        Vectors.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .withColumn("cell", Vectors.nearestCentroid(col("v"), centroids).cast("int"))
      .write.mode("overwrite").partitionBy("cell").parquet(root)

  /** Incrementally add vectors to an existing index WITHOUT a
    * rebuild: new rows are quantized with the SAME centroids (cell
    * assignment is append-stable — a coarse quantizer is fixed at
    * index build, as in any production IVF) and appended as new
    * parquet files inside their cell directories. Idempotent under
    * replay: ids already present are dropped by an anti-join against
    * the existing index before the write, so a re-delivered batch
    * adds nothing — the same at-least-once-to-exactly-once pattern
    * as [[Serving]]'s batch-id guard, keyed on content instead.
    */
  def append(spark: SparkSession, root: String, newEmb: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val staged = newEmb.select(
        col(idCol).as("vec_id"),
        Vectors.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .withColumn("cell", Vectors.nearestCentroid(col("v"), centroids).cast("int"))
    // absent root = empty index (first streaming append bootstraps
    // the layout) — one FS existence RPC, like IncrementalDedup's
    // band-index read
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(p)) spark.read.parquet(root).select(col("vec_id"))
      else spark.range(0).select(col("id").as("vec_id"))
    staged.join(existing, Seq("vec_id"), "left_anti")
      .write.mode("append").partitionBy("cell").parquet(root)
  }

  /** Top-k cosine neighbors for each query row against the
    * materialized index, probing each query's `nprobe` nearest cells.
    * Output: (query_id, rank, neighbor_id) — ids only, like the other
    * ANN entry points.
    *
    * `broadcastQueries` (the [[PqIndex.query]] switch): true is the
    * serving shape — the probe side broadcasts and DYNAMIC PARTITION
    * PRUNING reads only the probed cell directories. false is the
    * offline all-vs-index shape — the probe side SHUFFLES on the cell
    * key instead, for query datasets too large to broadcast; an
    * offline volume probes most cells anyway, so the lost pruning is
    * the serving optimization, not a correctness trade (results are
    * identical — AnnIndexSpec asserts parity on a 10k-query frame).
    */
  def query(spark: SparkSession, root: String, queries: DataFrame,
      centroids: Seq[Seq[Double]], k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    val index = spark.read.parquet(root)
    val q = queries.select(
        col(idCol).as("query_id"),
        Vectors.toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", Vectors.norm(col("qv")))
    val sims = centroids.zipWithIndex.map { case (cen, i) =>
      struct(Vectors.cosine(col("qv"), array(cen.map(lit(_)): _*)).as("sim"),
        lit(i).as("cell"))
    }
    val probed = q
      .withColumn("probe", slice(reverse(array_sort(array(sims: _*))), 1, nprobe))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(col("probe.cell")).as("cell"))
    val probeSide = if (broadcastQueries) broadcast(probed) else probed
    val scored = index.join(probeSide, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", Vectors.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"))
  }
}
