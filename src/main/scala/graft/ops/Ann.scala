package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Similarity search over an `array<float>` embedding column.
  *
  * Two paths:
  *  - `bruteForceKnn` — exact cosine top-k: broadcast the (small)
  *    query set against the corpus, per-query ranked with a
  *    WindowGroupLimit-bounded row_number. The corpus side streams —
  *    no shuffle of the big table, so at 100 TB this is one scan.
  *  - `ivfKnn` — the scale path: k-means-lite coarse quantizer
  *    (deterministic seeded sample as centroids), corpus bucketed by
  *    nearest centroid (computed once, co-partitioned), queries probe
  *    only `nprobe` nearest cells. Recall < 1 by design; measured
  *    against brute force in tests.
  */
object Ann {

  /** Scale-derived block count for the triangular all-pairs grid:
    * the smallest `b` whose b(b+1)/2 grid cells cover the session's
    * shuffle parallelism, so every shuffle partition gets ~one cell
    * of compares and the per-row replication factor (b+1) tracks
    * cluster size as ~√(2·parallelism) — the work O(n²) is fixed;
    * what must scale with the cluster is how finely it is sliced.
    * At local[32] this derives 8 (36 cells ≥ 32); at a 2000-partition
    * cluster, 63.
    */
  def defaultBlocks(spark: SparkSession): Int = {
    val parallelism = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Iterator.from(2).find(b => b.toLong * (b + 1) / 2 >= parallelism).get
  }

  /** Scale-derived IVF cell count: at least the shuffle parallelism
    * (so the per-cell equi-join can occupy every partition), floored
    * at 16. A quality-driven deployment would use ~√n cells; the
    * parallelism floor is the SHARDING constraint, which is what the
    * engine owns — callers with corpus statistics pass nCells
    * explicitly.
    */
  def defaultNumCells(spark: SparkSession): Int =
    math.max(16, spark.conf.get("spark.sql.shuffle.partitions").toInt)

  /** Normalize: id, vector-as-double, precomputed norm. */
  private def prep(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol).as("id"),
      Vectors.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))

  /** Exact top-k cosine neighbors for each query row (self-matches
    * excluded). Output: (query_id, rank, neighbor_id) — ids only, so
    * cross-engine float comparison never appears in results.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = prep(corpus, idCol, vecCol)
    val q = prep(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("sim", Vectors.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"))
  }

  /** Matryoshka-style truncated-dimension KNN (the MRL retrieval
    * trick, Kusupati et al. 2022 — embedding prefixes carry most of
    * the signal): stage 1 ranks the corpus by cosine over only the
    * FIRST `prefixDims` dimensions and keeps `candidates` rows per
    * query; stage 2 re-ranks ONLY those candidates with the exact
    * full-dimension cosine. At scale the prefix pass reads a
    * dims/prefixDims-smaller column (store embeddings
    * dimension-sliced and the full vector is only fetched for the
    * candidate set), and the per-query rank state stays bounded via
    * WindowGroupLimit. Both stages tie-break by id, so the composed
    * approximation is DETERMINISTIC and the gate's oracle replays
    * both stages verbatim — the gate pins the pipeline, recall vs
    * full KNN is the usual MRL trade-off, not an error.
    */
  def truncatedKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      prefixDims: Int, candidates: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    require(prefixDims >= 1, s"prefixDims=$prefixDims must be >= 1")
    val c = prep(corpus, idCol, vecCol)
      .withColumn("vp", slice(col("v"), 1, prefixDims))
      .withColumn("np", Vectors.norm(col("vp")))
    val q = prep(queries, idCol, vecCol)
      .withColumn("qp", slice(col("v"), 1, prefixDims))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("qp"), Vectors.norm(col("qp")).as("qpn"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_p").desc, col("id").asc)
    val cand = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("sim_p",
        Vectors.dot(col("vp"), col("qp")) / (col("np") * col("qpn")))
      .withColumn("rp", row_number().over(wp))
      .filter(col("rp") <= candidates)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id").asc)
    cand
      .withColumn("sim", Vectors.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"))
  }

  /** Hard-negative mining for contrastive/embedding training: per
    * anchor, the top-k MOST similar corpus rows whose similarity is
    * still BELOW `maxSim` — candidates so close they make the hardest
    * negatives, with near-duplicates (likely unlabeled positives,
    * cosine >= maxSim) excluded so the training signal isn't
    * poisoned. Same broadcast-scored single-pass plan as
    * [[bruteForceKnn]] with the positive band filtered before the
    * rank; the exclusion must happen pre-rank, not post-top-k, or
    * anchors with many near-dups would return fewer than k negatives.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      maxSim: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = prep(corpus, idCol, vecCol)
    val q = prep(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("sim", Vectors.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .filter(col("sim") < maxSim)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"))
  }

  /** Deterministic coarse centroids: the embeddings of the `nCells`
    * lowest-id corpus rows (a seedless, reproducible "sample" —
    * k-means iterations add nothing for a synthetic benchmark corpus,
    * and determinism matters more than centroid quality here).
    */
  def coarseCentroids(corpus: DataFrame, nCells: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val n = if (nCells > 0) nCells else defaultNumCells(corpus.sparkSession)
    corpus.select(col(idCol), Vectors.toDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol).asc).limit(n)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
  }

  /** IVF top-k: corpus rows live in their nearest-centroid cell;
    * each query probes its `nprobe` closest cells only. The
    * cell-assignment join is an equi-join on cell id — shuffle
    * partitions by cell, which is how a 1000-executor cluster would
    * shard a real IVF index.
    *
    * `broadcastQueries = true` (default) assumes a SMALL probed query
    * set (a serving batch, ≲ tens of MB after ×nprobe fan-out) and
    * streams the corpus against it with no corpus shuffle. For large
    * query volumes (offline all-vs-index scoring) pass `false`: both
    * sides then shuffle-partition by `cell`, which scales with
    * executors instead of driver/executor memory.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    val c = prep(corpus, idCol, vecCol)
      .withColumn("cell", Vectors.nearestCentroid(col("v"), centroids))
    val qCells = (q: DataFrame) => {
      // nprobe nearest cells per query, as rows (query_id, cell)
      val sims = centroids.zipWithIndex.map { case (cen, i) =>
        struct(Vectors.cosine(col("qv"), array(cen.map(lit(_)): _*)).as("sim"),
          lit(i).as("cell"))
      }
      q.withColumn("probe",
          slice(reverse(array_sort(array(sims: _*))), 1, nprobe))
        .select(col("query_id"), col("qv"), col("qn"),
          explode(col("probe.cell")).as("cell"))
    }
    val q = prep(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probed = qCells(q)
    val probedSide = if (broadcastQueries) broadcast(probed) else probed
    val scored = c.join(probedSide, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", Vectors.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"))
  }

  /** Global most-similar pairs: exact all-pairs cosine via a
    * triangular block-grid EQUI-join, top `topN` by similarity with
    * deterministic id tie-break. Ids only in the output.
    *
    * Why not a `id_a < id_b` theta-join: Spark executes that as a
    * BroadcastNestedLoop/cartesian product — one unsplittable task
    * pair at scale. And why not LSH blocking: measured on the test
    * corpus, the top-20 pair cosines are only 0.43–0.51 over a smooth
    * random background (no similarity gap), so sign-random-projection
    * banding cannot reach recall 1 without admitting nearly all pairs
    * — exactness would be lost. Exact global top pairs on gapless
    * data is intrinsically O(n²) compares; the scalable form is to
    * *distribute* those compares evenly:
    *
    * Rows are hashed into `blocks` buckets; each unordered bucket
    * pair (lo <= hi) is one join key. A row in bucket b enters the
    * left side under keys (b, b..blocks-1) and the right side under
    * keys (0..b, b), so every row pair meets under exactly one key.
    * The shuffle partitions by (lo, hi) — blocks(blocks+1)/2 evenly
    * sized cells, each ~ (n/blocks)² compares, spread across however
    * many executors exist. Replication factor is blocks+1 copies of
    * each row; `blocks = 0` (the default) derives it from the
    * session's shuffle parallelism ([[defaultBlocks]]) so the grid
    * tracks cluster size without a caller-side constant.
    * `topN` itself is a TakeOrderedAndProject (per-partition heap +
    * driver merge of topN rows) — no global sort.
    *
    * For corpora WITH a similarity gap (real near-dup detection), the
    * approximate-but-cheaper path is `ivfKnn`-style cell blocking;
    * this operator is the exact fallback.
    */
  def topSimilarPairs(emb: DataFrame, topN: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blocks: Int = 0): DataFrame = {
    val (scored, cached) = allPairsScored(emb, idCol, vecCol, blocks)
    finalized(
      scored
        .orderBy(col("sim").desc, col("id_a").asc, col("id_b").asc)
        .limit(topN)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("sim").desc, col("id_a").asc, col("id_b").asc)))
        .select(col("rank").cast("long").as("rank"), col("id_a"), col("id_b")),
      cached)
  }

  /** Materialize a (small) pairs result eagerly; the persisted prep
    * scan stays cached across calls (cache-manager plan dedup keeps
    * repeat queries warm) and is registered for explicit release —
    * see NearDup's identical policy.
    */
  private def finalized(result: DataFrame, cached: DataFrame): DataFrame = {
    val out = result.localCheckpoint(true)
    registry.synchronized { registry += cached }
    out
  }

  private val registry = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Unpersist every prep scan this module has cached. Call between
    * datasets in a long-lived session.
    */
  def releaseCaches(): Unit = registry.synchronized {
    registry.foreach(_.unpersist())
    registry.clear()
  }

  /** Embedding-cosine near-dup pairs: every pair with cosine >=
    * `threshold`, via the same exact block-grid equi-join (the
    * dedup-by-embedding mode of the training-data pipeline). Both
    * engines compare against the identical double literal, so the
    * pair set is oracle-exact.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blocks: Int = 0): DataFrame = {
    val (scored, cached) = allPairsScored(emb, idCol, vecCol, blocks)
    finalized(
      scored
        .filter(col("sim") >= threshold)
        .select(col("id_a"), col("id_b")),
      cached)
  }

  /** Random-hyperplane LSH near-dup pairs (SimHash for vectors,
    * Charikar '02): each embedding gets an `nBits`-bit signature —
    * bit i is the side of hyperplane h_i the vector falls on — the
    * signature splits into `nBits / bandBits` bands, candidate pairs
    * are vectors agreeing on at least ONE whole band, and candidates
    * verify by exact cosine >= `threshold`. This is the LSH-bucketed
    * scale path for embedding near-dup: the banding exchange carries
    * ONLY (id, band, bucket) rows — no vector payload — so at 100 TB
    * the shuffle is a few dozen bytes per vector, candidate compares
    * drop from O(n²) to the collision mass Σ m_i² over bucket sizes,
    * and vectors are fetched by id equi-join only for the (rare)
    * candidates. `cosineNearDupPairs` stays the exact fallback; this
    * inherits the classic (1-(1-s^b)^r)-style recall envelope.
    *
    * Determinism (and DuckDB replayability): hyperplanes are DATA-
    * DERIVED — h_i = v(2i) − v(2i+1) over the `2·nBits` lowest-id
    * corpus vectors — and the side test needs no elementwise
    * arithmetic because dot(x, va−vb) ≡ dot(x,va) − dot(x,vb):
    * bit_i(x) = [dot(x, v(2i)) >= dot(x, v(2i+1))], two plain dot
    * products both engines accumulate identically (left-to-right,
    * double). Hyperplanes are bounded driver metadata (2·nBits·dim
    * doubles), the same class as IVF centroids.
    */
  def rhpNearDupPairs(emb: DataFrame, threshold: Double, nBits: Int = 32,
      bandBits: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (result, cached) =
      rhpScored(emb, threshold, nBits, bandBits, idCol, vecCol)
    finalized(result, cached)
  }

  /** The un-finalized computation — (result, cachedPrep); the plan
    * seam for PlanSpec's hash-only-exchange assert (the public
    * operator checkpoints its small result, which hides the join
    * plan behind an RDD scan).
    */
  private[graft] def rhpScored(emb: DataFrame, threshold: Double,
      nBits: Int, bandBits: Int, idCol: String,
      vecCol: String): (DataFrame, DataFrame) = {
    require(nBits % bandBits == 0, s"nBits $nBits not divisible by bandBits $bandBits")
    val p0 = prep(emb, idCol, vecCol)
    val planes: Seq[Seq[Double]] = p0.orderBy(col("id").asc).limit(2 * nBits)
      .select(col("v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    // require BEFORE persisting: a too-small corpus must not leak an
    // unregistered cache entry on the failure path
    require(planes.size == 2 * nBits,
      s"corpus has fewer than ${2 * nBits} vectors for $nBits hyperplanes")
    // persisted: the signature pass and the two candidate-side vector
    // fetches below are three consumers of the prep scan.
    val p = p0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE plane-matrix literal + a transform HOF computes all 2·nBits
    // dot products per row — 64 separate literal-array dot
    // expressions would compile into a plan large enough that
    // Catalyst/codegen time dwarfs the data at bench scale, and the
    // per-row math is identical either way
    val dots = transform(typedlit(planes),
      pl => Vectors.dot(col("v"), pl))
    val nBands = nBits / bandBits
    val bandVals: Seq[Column] = (0 until nBands).map { bnd =>
      (0 until bandBits).map { j =>
        val i = bnd * bandBits + j
        (col("_dots")(2 * i) >= col("_dots")(2 * i + 1)).cast("int") *
          lit(1 << j)
      }.reduce(_ + _).cast("long")
    }
    // hash-only banding exchange: (id, band, bucket) rows, no vectors
    val banded = p.withColumn("_dots", dots)
      .select(col("id"), explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"), bandVals(b).as("bv"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val cand = banded.select(col("band"), col("bv"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bv"), col("id").as("id_b")),
        Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // vectors rejoin by id only for candidates (the fetch stage)
    val a = p.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    (cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("sim", Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b")),
      p)
  }

  /** Embedding-level benchmark decontamination: corpus rows whose
    * cosine similarity to ANY benchmark vector reaches `threshold`
    * are dropped; survivors' ids return. The semantic sibling of the
    * n-gram [[NearDup.contaminationOverlap]] — catches paraphrased
    * eval leakage that token overlap misses.
    *
    * Scale shape: the benchmark side is small by definition (an eval
    * suite, thousands of rows vs the corpus' billions), so it
    * BROADCASTS and the whole check is one anti nested-loop pass over
    * the corpus — row-local predicate, zero shuffle, corpus read
    * once. The nested loop is the point here, not a smell: the
    * predicate is a similarity threshold (no equi-key exists), the
    * inner side is bounded driver-size metadata, and cost is
    * O(|corpus| · |benchmark|) flops exactly like a brute-force KNN
    * scoring pass.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = prep(corpus, idCol, vecCol)
    val b = prep(benchmark, idCol, vecCol)
      .select(col("v").as("bv"), col("nrm").as("bn"))
    c.join(broadcast(b),
        Vectors.dot(col("v"), col("bv")) / (col("nrm") * col("bn")) >= threshold,
        "left_anti")
      .select(col("id").as(idCol))
  }

  /** SemDeDup-style semantic dedup: assign every embedding to its
    * nearest coarse centroid (cosine, lowest-index tie-break — the
    * same quantizer `ivfKnn` uses), then find near-duplicate pairs
    * (cosine >= `threshold`) WITHIN each cell only, via a self
    * equi-join on the cell id.
    *
    * This is the scale path for embedding dedup on clusterable
    * corpora: candidate compares drop from O(n²) to O(Σ m_i²) over
    * cell sizes m_i, and the join shuffles by cell exactly like a
    * sharded IVF index. (For gapless corpora where exactness across
    * cell boundaries matters, `cosineNearDupPairs` is the exact
    * fallback.) Output: (cell, id_a < id_b) pairs.
    */
  def semanticDedupPairs(emb: DataFrame, centroids: Seq[Seq[Double]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // persisted: both sides of the self-join consume the assignment.
    val assigned = prep(emb, idCol, vecCol)
      .withColumn("cell",
        Vectors.nearestCentroid(col("v"), centroids).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    finalized(
      a.join(b, Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("sim") >= threshold)
        .select(col("cell"), col("id_a"), col("id_b")),
      assigned)
  }

  /** Exact all-pairs cosine as (id_a < id_b, sim) rows, distributed
    * via the triangular block-grid equi-join (see [[topSimilarPairs]]
    * for the design rationale). Returns (scored, cachedPrep) — the
    * caller unpersists the prep once its result is materialized.
    */
  private[graft] def allPairsScored(emb: DataFrame, idCol: String, vecCol: String,
      blocks: Int): (DataFrame, DataFrame) = {
    val b = if (blocks > 0) blocks else defaultBlocks(emb.sparkSession)
    // persisted: lo and hi below are two consumers of this prep scan
    // (normalize + norm + bucket assignment) — cache it once.
    val p = prep(emb, idCol, vecCol)
      .withColumn("blk", pmod(xxhash64(col("id")), lit(b)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lo = p.select(col("id").as("id_x"), col("v").as("vx"), col("nrm").as("nx"),
      col("blk").as("blk_lo"), explode(sequence(col("blk"), lit(b - 1))).as("blk_hi"))
    val hi = p.select(col("id").as("id_y"), col("v").as("vy"), col("nrm").as("ny"),
      explode(sequence(lit(0), col("blk"))).as("blk_lo"), col("blk").as("blk_hi"))
    val scored = lo.join(hi, Seq("blk_lo", "blk_hi"))
      // same-bucket cell sees both orders + self-pairs: keep x<y once.
      .filter(col("blk_lo") =!= col("blk_hi") || col("id_x") < col("id_y"))
      .withColumn("sim", Vectors.dot(col("vx"), col("vy")) / (col("nx") * col("ny")))
      .select(
        least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        col("sim"))
    (scored, p)
  }
}
