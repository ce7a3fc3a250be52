package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact quantized k-means (one Lloyd refinement step) over an
  * embedding column — the "trained coarse quantizer" a real IVF /
  * SemDeDup pipeline runs before cell sharding (the gate's other
  * embed entries use the untrained k-lowest-id quantizer;
  * cf. reference ivf usage in topk-pinot-flink's analytics surface).
  *
  * Exactness design: embeddings are first snapped to an integer grid
  * (`round(x * scale)`, scale a power of two so the double multiply
  * is exact), after which EVERY downstream number — squared L2
  * distances, per-cell component sums, the round-half-up refined
  * centroids — is integer arithmetic two engines compute
  * bit-identically. That is what lets the driver gate hash-check
  * k-means ASSIGNMENTS against a DuckDB oracle, instead of settling
  * for a rows-only check; float k-means can differ across engines in
  * the last ulp of a reduction and flip an argmin. Grid error is part
  * of the algorithm's definition, not a comparison tolerance.
  *
  * Scale shape: one pass computes assignments map-side (centroids are
  * literal expressions — k·dim longs of driver metadata, the same
  * bounded class as [[Ann.coarseCentroids]]); the centroid update is
  * one posexplode + map-side-combining groupBy on (cell, dim) —
  * k·dim result rows regardless of corpus size. No per-row driver
  * work, no join against the corpus. Magnitude bounds: |x| ≲ 1 ⇒
  * quantized |v| ≲ scale, per-row distances ≤ dim·(2·scale)² (~2^36
  * at scale 2^16); the per-cell component sums travel as
  * DECIMAL(38,0) so the distributed reduction can't overflow at any
  * row count (a BIGINT sum would turn over past ~1e9 rows per cell);
  * the assignment math itself is row-local and safe at any corpus
  * size.
  */
object KMeans {

  /** (vec_id, cell_init, cell_refined): assignment under the k
    * lowest-id init centroids, then under the exactly-recomputed
    * (round-half-up component mean) centroids — one Lloyd step.
    * Empty cells keep their init centroid. Ties break to the lowest
    * cell id in both passes.
    */
  def lloydRefine(emb: DataFrame, k: Int = 10, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lloydRefineWithCentroids(emb, k, scale, idCol, vecCol)._1

  /** The refined centroids as unit-scale doubles (grid value / scale —
    * exact: longs this small divide exactly into doubles), ready to
    * feed [[Ann.ivfKnn]] / [[graft.serving.AnnIndex]] as a TRAINED
    * coarse quantizer in place of the k-lowest-id one.
    */
  def refinedCentroids(emb: DataFrame, k: Int = 10, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] =
    lloydRefineWithCentroids(emb, k, scale, idCol, vecCol)
      ._2.map(_.map(_.toDouble / scale))

  /** THE grid snap — every engine path must use this one expression
    * (the exactness contract is bit-identity of the quantization
    * everywhere: assignments, codes, and LUTs all compare numbers
    * derived from it). transform is an interpreted HOF, but each
    * caller runs it once per row into a persisted/collected frame —
    * the re-evaluation trap (see Text.shinglesFromTokens) doesn't
    * apply. round() is HALF_UP in Spark and half-away-from-zero in
    * DuckDB: identical on the non-negative-scaled grid ties.
    */
  private def quantize(vecCol: String, scale: Long): Column =
    transform(col(vecCol), x => round(x.cast("double") * scale).cast("long"))

  /** Persisted (vec_id, xq) frame + the k-lowest-id codebook rows
    * (bounded driver metadata, like [[Ann.coarseCentroids]]). Caller
    * unpersists the frame.
    */
  private def quantizedWithCodebook(emb: DataFrame, k: Int, scale: Long,
      idCol: String, vecCol: String): (DataFrame, Seq[Seq[Long]]) = {
    val xq = emb.select(col(idCol).as("vec_id"), quantize(vecCol, scale).as("xq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val init: Seq[Seq[Long]] = xq.orderBy(col("vec_id").asc).limit(k)
      .collect().map(_.getSeq[Long](1).toSeq).toSeq
    require(init.size == k, s"corpus has fewer than k=$k vectors")
    (xq, init)
  }

  private def lloydRefineWithCentroids(emb: DataFrame, k: Int, scale: Long,
      idCol: String, vecCol: String): (DataFrame, Seq[Seq[Long]]) = {
    val (xq, init) = quantizedWithCodebook(emb, k, scale, idCol, vecCol)
    val a0 = xq.withColumn("cell_init", assignment(init))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-(cell, dim) component sums: k·dim bounded driver rows.
    // DECIMAL(38,0) on the wire: a BIGINT sum of scale-2^16 grid
    // components overflows past ~1e9 rows per cell — exactness must
    // hold in the distributed reduction itself, not just in the
    // BigInt math after collect (same policy as the z-score path).
    val sums = a0
      .select(col("cell_init"), posexplode(col("xq")).as(Seq("d", "v")))
      .groupBy(col("cell_init"), col("d"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        (BigInt(r.getDecimal(2).toBigInteger), r.getLong(3))))
      .toMap
    // component mean rounded half-up EXACTLY: floor((2s+n)/(2n)) on
    // BigInt (floor via the always-nonnegative BigInt.mod) — the same
    // formula the DuckDB oracle spells with portable truncating %.
    val refined = init.indices.map { i =>
      init(i).indices.map { d =>
        sums.get((i.toLong, d)) match {
          case Some((s, n)) =>
            val num = 2 * s + n
            val den = BigInt(2) * n
            ((num - num.mod(den)) / den).toLong
          case None => init(i)(d)
        }
      }
    }
    val out = a0.withColumn("cell_refined", assignment(refined))
      .select(col("vec_id"), col("cell_init"), col("cell_refined"))
      .localCheckpoint(true)
    a0.unpersist()
    xq.unpersist()
    (out, refined.map(_.toSeq))
  }

  /** Product-quantization codes (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI'11): the embedding splits
    * into `m` contiguous subspaces, each encoded independently as the
    * index of its nearest sub-centroid — m small ints replace dim
    * floats (the memory layout real billion-vector ANN serving
    * stores). Same exactness contract as [[lloydRefine]]: vectors
    * snap to the 2^16 integer grid first, sub-codebooks are the k
    * lowest-id vectors' subvectors, distances/argmins are pure
    * integer math — so the full code table hash-checks against a
    * DuckDB recompute. Assignment is m compact
    * [[graft.functions.VecArgminSqDist]] nodes over array slices —
    * row-local, one pass, no shuffle at any corpus size (the codebook
    * is k·dim driver metadata).
    */
  def pqCodes(emb: DataFrame, m: Int = 16, k: Int = 64, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqCodesWithCodebook(emb, m, k, scale, idCol, vecCol)._1

  private def pqCodesWithCodebook(emb: DataFrame, m: Int, k: Int, scale: Long,
      idCol: String, vecCol: String): (DataFrame, Seq[Seq[Long]]) = {
    val (xq, init) = quantizedWithCodebook(emb, k, scale, idCol, vecCol)
    val dim = init.head.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val codeCols = (0 until m).map { s =>
      val cents = init.map(_.slice(s * sub, (s + 1) * sub))
      graft.functions.VecExprs
        .vec_argmin_sqdist(slice(col("xq"), s * sub + 1, sub), cents)
        .as(s"code_$s")
    }
    val out = xq.select(col("vec_id") +: codeCols: _*).localCheckpoint(true)
    xq.unpersist()
    (out, init)
  }

  /** PQ asymmetric-distance KNN (ADC — Jégou et al. §IV): each query
    * precomputes one m×k lookup table of exact subspace distances to
    * every sub-centroid; a candidate's approximate distance is then m
    * table lookups summed over its CODES — the corpus vectors
    * themselves are never touched at query time, which is the entire
    * point of PQ serving (m bytes/vector in place of dim floats).
    *
    * Everything is grid-integer arithmetic over the same codebook as
    * [[pqCodes]], so the approximate RANKING is deterministic and the
    * gate hash-checks it end-to-end (ties break on neighbor id).
    * Scale shape: the per-query LUT is a row-local engine expression
    * ([[lutCol]]) — the query side is a DataFrame end-to-end, any
    * size. The candidate pass itself is a broadcast nested-loop of
    * the code table against the query LUTs: exhaustive ADC is
    * inherently |codes|×|queries|, so it assumes a serving-batch
    * query side; [[ivfAdcQuery]] (cell-pruned, equi-join) is the
    * large-query-volume path.
    */
  def adcKnn(corpus: DataFrame, queries: DataFrame, topK: Int,
      m: Int = 16, k: Int = 64, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (codes, init) = pqCodesWithCodebook(corpus, m, k, scale, idCol, vecCol)
    val dim = init.head.size
    val sub = dim / m
    // per-query LUT: luts(s)(c) = ||q_sub(s) - cent_c_sub(s)||²,
    // computed BY THE ENGINE so driver and executors can't disagree
    // on rounding — and no driver-side query handling at all
    val lutDf = queries
      .select(col(idCol).as("query_id"), quantize(vecCol, scale).as("xq"))
      .withColumn("luts", lutCol(col("xq"), init, m, sub))
      .select(col("query_id"), col("luts"))
    val adc = (0 until m)
      .map(s => element_at(element_at(col("luts"), s + 1), col(s"code_$s").cast("int") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("vec_id").asc)
    codes.crossJoin(broadcast(lutDf))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** IVFADC (Jégou et al. §V — the FAISS billion-scale layout):
    * coarse-quantize every vector to one of `coarseK` cells, then
    * product-quantize its RESIDUAL (vector − coarse centroid); a
    * query probes its `nprobe` nearest cells and ranks only their
    * members by ADC over per-(query, probed-cell) residual LUTs. Two
    * approximations compose — cell pruning and code quantization —
    * and both are deterministic grid-integer arithmetic here, so the
    * result hash-checks end-to-end like the rest of the family.
    *
    * The residual trick in code form: assignment computes the
    * residual x − coarse_cell ONCE (one zip_with against the coarse
    * matrix carried as a single literal), then runs m compact argmin
    * nodes over the unshifted sub-codebook — the identity
    * ‖(x−coarse_c) − sub_j‖² = ‖x − (coarse_c + sub_j)‖² makes the
    * per-cell shifted codebooks unnecessary, so the expression count
    * is m + 1 regardless of coarseK. Sub-codebook = residuals of the
    * k lowest-id vectors w.r.t. their own cells.
    *
    * Scale shape: codes are ONE corpus pass; candidate selection is
    * an equi-join of the code table against nprobe·|queries| broadcast
    * LUT rows ON THE CELL KEY — exactly how a sharded IVFADC fans a
    * probe out to its cells, no corpus shuffle, per-query top-k via
    * WindowGroupLimit.
    */
  def ivfAdcKnn(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int = 4, coarseK: Int = 8, m: Int = 16, k: Int = 64,
      scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val idx = ivfAdcIndex(corpus, coarseK, m, k, scale, idCol, vecCol)
    ivfAdcQuery(idx, queries, topK, nprobe, scale, idCol, vecCol)
  }

  /** The built index: checkpointed code table + the two codebooks
    * (driver metadata). Build once per corpus, serve many query
    * batches — the split every serving path here follows
    * ([[graft.serving.AnnIndex]], the rollup tables).
    */
  case class IvfAdcIndex(codes: DataFrame, coarse: Seq[Seq[Long]],
      subCB: Seq[Seq[Long]], m: Int)

  def ivfAdcIndex(corpus: DataFrame,
      coarseK: Int = 8, m: Int = 16, k: Int = 64, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfAdcIndex = {
    val (xq, coarse) = quantizedWithCodebook(corpus, coarseK, scale, idCol, vecCol)
    val dim = coarse.head.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // sub-codebook: residuals of the k lowest-id vectors w.r.t. their
    // own coarse cell (k·dim driver metadata)
    val cbVecs: Seq[Seq[Long]] = xq.orderBy(col("vec_id").asc).limit(k)
      .collect().map(_.getSeq[Long](1).toSeq).toSeq
    require(cbVecs.size == k, s"corpus has fewer than k=$k vectors")
    val subCB: Seq[Seq[Long]] = cbVecs.map { v =>
      val cc = coarse(nearestCell(coarse)(v))
      v.indices.map(i => v(i) - cc(i))
    }
    // codes: cell assignment, residual once, m argmin nodes — see the
    // residual-identity note in the scaladoc. The earlier form (an
    // m×coarseK when-chain, each arm carrying a shifted-codebook
    // literal) was the same Catalyst analysis-cost explosion
    // [[assignment]] exists to avoid; KMeansSpec asserts the node
    // count is now coarseK-independent.
    val celled = xq.withColumn("cell", assignment(coarse))
      .withColumn("res", residualCol(coarse))
    val codes = celled
      .select(col("vec_id") +: col("cell") +: residualCodeCols(subCB, m, sub): _*)
      .localCheckpoint(true)
    xq.unpersist()
    IvfAdcIndex(codes, coarse, subCB, m)
  }

  /** Incrementally absorb new vectors into an existing index WITHOUT
    * retraining: both codebooks are FROZEN (coarse + sub — a
    * production IVFADC serving realtime appends never moves its
    * quantizers under stored codes; analog: the reference's realtime
    * segment append, orders_raw_upsert_table.json:39-49), new rows
    * are assigned and encoded by the same expressions as the build,
    * and the merged code table is re-checkpointed. Idempotent under
    * replay: ids already present are dropped by an anti-join before
    * the union, so a re-delivered batch adds nothing — the
    * content-keyed twin of [[graft.serving.Serving]]'s batch-id
    * guard, mirroring [[graft.serving.AnnIndex.append]].
    */
  def ivfAdcAppend(idx: IvfAdcIndex, newVecs: DataFrame, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfAdcIndex =
    IvfAdcIndex(
      idx.codes.unionByName(stagedCodes(idx, newVecs, scale, idCol, vecCol))
        .localCheckpoint(true),
      idx.coarse, idx.subCB, idx.m)

  /** The frozen-codebook encode + already-present anti-join shared by
    * [[ivfAdcAppend]] (in-memory merge) and
    * [[graft.serving.PqIndex.append]] (per-cell file append): new rows
    * are assigned and encoded by the same expressions as the build,
    * ids already in the index drop out, so replays add nothing.
    */
  private[graft] def stagedCodes(idx: IvfAdcIndex, newVecs: DataFrame,
      scale: Long, idCol: String, vecCol: String): DataFrame = {
    val dim = idx.coarse.head.size
    val sub = dim / idx.m
    newVecs
      .select(col(idCol).as("vec_id"), quantize(vecCol, scale).as("xq"))
      .withColumn("cell", assignment(idx.coarse))
      .withColumn("res", residualCol(idx.coarse))
      .select(col("vec_id") +: col("cell") +:
        residualCodeCols(idx.subCB, idx.m, sub): _*)
      .join(idx.codes.select("vec_id"), Seq("vec_id"), "left_anti")
  }

  /** Probe + rank against a built index. Every query-side number —
    * quantization, probe-cell choice, residual, LUT — is a row-local
    * engine expression: no driver-side query handling, so "queries"
    * can be a full dataset, not just a serving batch.
    * `broadcastQueries = true` (default) broadcasts the
    * nprobe·|queries| LUT rows and streams the code table against
    * them; pass `false` for offline all-vs-index volumes — both sides
    * then shuffle BY CELL, exactly how a sharded IVFADC fans probes
    * out to its cells (the [[Ann.ivfKnn]] contract).
    */
  def ivfAdcQuery(idx: IvfAdcIndex, queries: DataFrame, topK: Int,
      nprobe: Int = 4, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val IvfAdcIndex(codes, coarse, subCB, m) = idx
    val dim = coarse.head.size
    val sub = dim / m
    // squared L2 to every coarse cell (one transform over the coarse
    // matrix literal), then (dist, cell) struct sort — ascending
    // lexicographic, so ties break to the lowest cell like
    // [[assignment]] and the DuckDB oracle
    val dists = transform(typedlit(coarse.map(_.toSeq)), c =>
      aggregate(zip_with(col("xq"), c, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x))
    val ranked = transform(dists, (d, i) =>
      struct(d.as("d"), i.cast("long").as("cell")))
    val probeDf = queries
      .select(col(idCol).as("query_id"), quantize(vecCol, scale).as("xq"))
      .withColumn("cell",
        explode(slice(array_sort(ranked), 1, nprobe).getField("cell")))
      .withColumn("res", residualCol(coarse))
      .withColumn("luts", lutCol(col("res"), subCB, m, sub))
      .select(col("query_id"), col("cell"), col("luts"))
    val adc = (0 until m)
      .map(s => element_at(element_at(col("luts"), s + 1), col(s"code_$s").cast("int") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("vec_id").asc)
    codes.join(if (broadcastQueries) broadcast(probeDf) else probeDf, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** The residual x − coarse(cell): one zip_with against the coarse
    * matrix carried as a SINGLE typedlit literal, so the node count is
    * independent of coarseK. zip_with is an interpreted HOF, but like
    * [[quantize]] each caller evaluates it once per row into a
    * checkpointed frame — the hot query path only ever touches the
    * resulting codes.
    */
  private[graft] def residualCol(coarse: Seq[Seq[Long]]): Column =
    zip_with(col("xq"),
      element_at(typedlit(coarse.map(_.toSeq)), col("cell").cast("int") + 1),
      (x, c) => x - c)

  /** Per-subspace PQ codes of the residual: m compact
    * [[graft.functions.VecArgminSqDist]] nodes over sub-codebook
    * slices — the same shape as [[pqCodes]]' assignment.
    */
  private[graft] def residualCodeCols(subCB: Seq[Seq[Long]], m: Int, sub: Int): Seq[Column] =
    (0 until m).map { s =>
      graft.functions.VecExprs.vec_argmin_sqdist(
          slice(col("res"), s * sub + 1, sub),
          subCB.map(_.slice(s * sub, (s + 1) * sub)))
        .as(s"code_$s")
    }

  /** Per-subspace ADC lookup table of `of` against a codebook:
    * lut(s)(c) = ||of_sub(s) − cb_c_sub(s)||², spelled as HOFs over
    * the codebook carried as ONE literal. Row-local integer math
    * identical to a driver-side loop, which is the point: the query
    * side stays a DataFrame at any size. Interpreted HOFs are fine
    * here — per-row work is the algorithmic k·dim multiply-adds and
    * the expression tree is constant-size.
    */
  private def lutCol(of: Column, cb: Seq[Seq[Long]], m: Int, sub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), s =>
      transform(typedlit(cb.map(_.toSeq)), c =>
        aggregate(
          zip_with(
            slice(of, s * lit(sub) + 1, lit(sub)),
            slice(c, s * lit(sub) + 1, lit(sub)),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)))

  /** argmin by squared L2 on the driver — tie to the lowest cell,
    * matching [[graft.functions.VecArgminSqDist]].
    */
  private def nearestCell(cents: Seq[Seq[Long]])(v: Seq[Long]): Int =
    cents.indices.map { c =>
      (v.indices.map { i => val d = v(i) - cents(c)(i); d * d }.sum, c)
    }.min._2

  /** argmin cell by (distance, cell id) — a single
    * [[graft.functions.VecArgminSqDist]] node carrying the centroid
    * matrix as one reference object. The same math spelled as k·dim
    * column arithmetic builds a ~20k-node tree whose Catalyst
    * analysis alone cost ~4 s per call (measured at k=10, dim=64);
    * the compact node brings the whole lloydRefine to well under a
    * second. Ties break to the lowest cell in both forms.
    */
  private def assignment(cents: Seq[Seq[Long]]): Column =
    graft.functions.VecExprs.vec_argmin_sqdist(col("xq"), cents)

  /** Per-group centroid outliers — the embedding-quality curation
    * step: for every label the k vectors FARTHEST (squared L2) from
    * their group's mean embedding, i.e. the mislabeled/noisy examples
    * a pipeline prunes or audits before training.
    *
    * Exactness: on the scale-2^16 grid, ranking by
    * n·Σ_d v_d² − 2·Σ_d v_d·S_d (S = per-(group,dim) component sum,
    * n = group size) orders identically to distance-to-mean — the
    * per-group constant Σ_d (S_d/n)² cancels inside a group — and
    * every term is integer, carried as DECIMAL(38,0) through the
    * distributed reduction (n·2^34-scale addends; exact to any
    * realistic group size), so the DuckDB oracle (HUGEINT) ranks
    * bit-identically. No floating-point mean ever exists.
    *
    * Plan shape: one narrow posexplode, a broadcast join against the
    * (groups × dims) stats rows, one groupBy(vec) shuffle, and a
    * per-group rank that plans as WindowGroupLimit — no pairwise
    * distances, nothing quadratic, no driver data.
    */
  def centroidOutliers(emb: DataFrame, k: Int = 5, scale: Long = 65536,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the exploded grid feeds both the stats aggregate and
    // the scoring join — without it the interpreted quantize HOF runs
    // twice over the corpus (the re-evaluation trap in quantize's
    // scaladoc; the cache manager dedupes repeated calls by plan)
    val ex = emb.select(col(idCol).as("vec_id"),
        col(labelCol).cast("long").as("label"),
        posexplode(quantize(vecCol, scale)).as(Seq("d", "v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val st = ex.groupBy("label", "d")
      .agg(sum(col("v").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
    val key = ex.join(broadcast(st), Seq("label", "d"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("v").cast("decimal(38,0)") *
        (col("n").cast("decimal(38,0)") * col("v") - lit(2) * col("s"))).as("kk"))
    val w = Window.partitionBy(col("label")).orderBy(col("kk").desc, col("vec_id").asc)
    key.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label"), col("vec_id"), col("rank"))
  }
}
