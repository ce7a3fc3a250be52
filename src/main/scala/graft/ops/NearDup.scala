package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Near-duplicate detection for document corpora — the dedup family a
  * training-data pipeline needs at 100 TB: exact (hash), exact
  * n-gram Jaccard via an inverted shingle index, MinHash+LSH banding,
  * and frequency-weighted SimHash with pigeonhole-chunk blocking.
  *
  * Scale design: nothing here compares all pairs. Candidate
  * generation is always an equi-join on a blocking key (shingle,
  * LSH band hash, simhash chunk) — a plain shuffled hash join that
  * partitions by the key at any data size — followed by exact
  * verification on the candidates only. All verification math is
  * integer (shingle counts), so thresholds are exact and
  * oracle-comparable.
  */
object NearDup {

  /** Exact duplicate groups by full-text hash: canonical (min) doc id
    * per group + member count. One shuffle on the 128-bit hash.
    */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_docs"))

  /** Docs → (id, distinct shingle set, set size). The token array is
    * materialized in its own projection first — see
    * [[Text.shinglesFromTokens]]'s note on the interpreted-HOF
    * re-split cost.
    */
  def shingleSets(docs: DataFrame, n: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .select(
        col("doc_id"),
        Text.shinglesFromTokens(col("toks"), n).as("sh"))
      .withColumn("sh_size", size(col("sh")).cast("long"))

  /** Exploded inverted index (doc_id, sh_size, shingle) — one row per
    * distinct shingle occurrence. Persisted (memory-and-disk) because
    * every near-dup query walks it several times: document frequency,
    * prefix selection, signature aggregation, and candidate
    * verification would otherwise each re-shingle the corpus.
    * Spark's cache manager dedupes by analyzed plan, so repeated calls
    * with the same inputs share one materialization.
    */
  def postingsOf(docs: DataFrame, n: Int): DataFrame =
    postingsNoCache(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The same inverted index WITHOUT the persist — for single-pass
    * consumers (band signatures) and per-call serving paths, where a
    * cached plan per distinct input frame would accumulate forever
    * (every micro-batch / query batch is a new plan, so the cache
    * manager's plan-dedup never reuses it and nothing releases it).
    */
  private[graft] def postingsNoCache(docs: DataFrame, n: Int): DataFrame =
    shingleSets(docs, n).filter(col("sh_size") > 0)
      .select(col("doc_id"), col("sh_size"), explode(col("sh")).as("shingle"))

  /** Jaccard(a,b) >= num/den as exact integer predicate:
    * c/(|A|+|B|-c) >= num/den  ⟺  c*(den+num) >= num*(|A|+|B|).
    */
  private def jaccardAtLeast(c: Column, sa: Column, sb: Column, num: Int, den: Int): Column =
    c * (den + num) >= (sa + sb) * num

  /** Exact n-gram Jaccard near-dup pairs via prefix-filtered inverted
    * index (the AllPairs/PPJoin prefix principle, Bayardo et al.
    * WWW'07): order shingles globally rarest-first; any pair with
    * J >= t must share an element inside both docs' prefixes of
    * length |X| - ceil(t*|X|) + 1 (the smallest-ordered common
    * element provably lies in both prefixes), so only prefix
    * postings are joined — the frequent-shingle quadratic flood of a
    * naive inverted index never happens. Candidates are then
    * exact-verified on full shingle sets with integer arithmetic.
    * Output: (doc_a < doc_b, common_shingles, shingles_a, shingles_b).
    */
  def jaccardPairs(docs: DataFrame, n: Int, thresholdNum: Int, thresholdDen: Int): DataFrame = {
    val postings = postingsOf(docs, n)
    val freq = postings.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("shingle").asc)
    // prefix length = L - ceil(t*L) + 1, t = num/den, exact integers
    val ceilTL = floor((col("sh_size") * thresholdNum + lit(thresholdDen - 1)) / thresholdDen)
      .cast("long")
    // persisted: the self-join below would otherwise evaluate this
    // window-over-join subtree once per side.
    val prefix = postings.join(freq, "shingle")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("sh_size") - ceilTL + 1)
      .select(col("doc_id"), col("sh_size"), col("pos"), col("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Two more exact prunes at the prefix join, before the distinct
    // and the verify join:
    //  - length filter (Arasu et al.): J >= t forces
    //    t*|A| <= |B| <= |A|/t;
    //  - PPJoin positional filter: J >= num/den needs overlap
    //    c >= alpha = ceil(num*(|A|+|B|)/(den+num)), and a match at
    //    sorted positions (px, py) bounds c <= 1 + min(|A|-px, |B|-py)
    //    for the pair's FIRST common element. The first common element
    //    carries the largest bound, so dropping rows whose bound < alpha
    //    never drops a pair with true c >= alpha (measured ~3x fewer
    //    candidates at threshold 0.5).
    val sx = col("x.sh_size"); val sy = col("y.sh_size")
    // ceil(num*(sa+sb)/(den+num)) as floor((a + b - 1)/b): the double
    // quotient of small longs floors correctly (integer results are
    // exactly representable; fractional ones sit >= 1/b above floor).
    val alpha = floor(
      ((sx + sy) * thresholdNum + lit(thresholdDen + thresholdNum - 1)) /
        lit(thresholdDen + thresholdNum)).cast("long")
    val cand = prefix.as("x").join(prefix.as("y"), "shingle")
      .filter(col("x.doc_id") < col("y.doc_id") &&
        sy * thresholdDen >= sx * thresholdNum &&
        sx * thresholdDen >= sy * thresholdNum &&
        lit(1) + least(sx - col("x.pos"), sy - col("y.pos")) >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    finalized(verifyPairs(cand, postings, thresholdNum, thresholdDen),
      prefix, postings)
  }

  /** Eagerly materialize a (small) result — near-dup outputs are
    * pair/group lists orders of magnitude smaller than their inputs —
    * and REGISTER the persisted intermediates (postings, prefixes,
    * buckets) for explicit release. The intermediates deliberately
    * stay cached across calls: Spark's cache manager dedupes by
    * analyzed plan, so repeated near-dup queries over the same corpus
    * skip re-shingling (the Pinot warm-segment behavior, and what the
    * warm bench numbers measure). The cost is bounded cached blocks
    * per distinct corpus in a long-lived session — a multi-dataset
    * service calls [[releaseCaches]] when it rotates datasets.
    */
  private def finalized(result: DataFrame, caches: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    registry.synchronized { registry ++= caches }
    out
  }

  private val registry = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Unpersist every intermediate this module has cached (shingle
    * postings, prefix tables, LSH buckets, simhash chunks). Call
    * between datasets in a long-lived session.
    */
  def releaseCaches(): Unit = registry.synchronized {
    registry.foreach(_.unpersist())
    registry.clear()
  }

  /** Exact-verify candidate pairs against the inverted index — no
    * shingle arrays are ever carried through a join. The intersection
    * size is a postings⋈postings count: fan each candidate pair out to
    * doc_a's postings (Σ|A| rows over candidates, not corpus²), keep
    * the rows doc_b also has via an equi-join on (doc_b, shingle),
    * and count per pair. Shingles are distinct per doc, so the count
    * IS |A ∩ B|; the threshold test is exact integer arithmetic.
    */
  private[graft] def verifyPairs(cand: DataFrame, postings: DataFrame,
      thresholdNum: Int, thresholdDen: Int): DataFrame =
    verifyPairsAcross(cand, postings, postings, thresholdNum, thresholdDen)

  /** [[verifyPairs]] generalized to candidates whose two sides come
    * from DIFFERENT postings tables (cross-corpus verification) —
    * same exact-integer Jaccard, same postings-join shape.
    */
  private[graft] def verifyPairsAcross(cand: DataFrame, postingsA: DataFrame,
      postingsB: DataFrame, thresholdNum: Int, thresholdDen: Int): DataFrame = {
    val pa = postingsA.select(col("doc_id").as("doc_a"), col("sh_size").as("shingles_a"), col("shingle"))
    val pb = postingsB.select(col("doc_id").as("doc_b"), col("sh_size").as("shingles_b"), col("shingle"))
    cand.join(pa, "doc_a")
      .join(pb, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        count(lit(1)).as("common_shingles"),
        first(col("shingles_a")).as("shingles_a"),
        first(col("shingles_b")).as("shingles_b"))
      .filter(jaccardAtLeast(col("common_shingles"), col("shingles_a"), col("shingles_b"),
        thresholdNum, thresholdDen))
      .select("doc_a", "doc_b", "common_shingles", "shingles_a", "shingles_b")
  }

  /** MinHash signatures: for seed i in [0, numHashes), min over the
    * doc's shingles of xxhash64(i, shingle). Computed as one explode +
    * a single hash aggregation with numHashes `min` buffers — fully
    * codegen'd, partial-agg (map-side combine) before the shuffle, one
    * pass over postings at any corpus size. (A lambda-based
    * `transform(seq, i -> array_min(...))` formulation is interpreted
    * and re-evaluated per consumer — orders of magnitude slower.)
    * Output: (doc_id, sh_size, sig array<long>).
    */
  def minhashSigs(docs: DataFrame, n: Int, numHashes: Int): DataFrame =
    minhashSigsFromPostings(postingsOf(docs, n), numHashes)

  /** MinHash signatures from a prebuilt (doc_id, sh_size, shingle)
    * inverted index — lets one persisted postings table feed both
    * signature aggregation and candidate verification.
    */
  def minhashSigsFromPostings(postingsIn: DataFrame, numHashes: Int): DataFrame = {
    require(numHashes <= 64, "hash family is h1 XOR rotl(h2, i), i < 64")
    // Two base hashes per shingle; family member i mixes them as
    // h1 XOR rotl(h2, i) — the Kirsch-Mitzenmacher idea with XOR
    // instead of +/* (Spark 4 ANSI mode makes overflowing long
    // arithmetic throw; XOR/rotate is overflow-free and equally fine
    // for LSH since candidates are exact-verified anyway). One string
    // hash pass instead of numHashes passes.
    val postings = postingsIn
      .withColumn("h1", xxhash64(col("shingle")))
      .withColumn("h2", xxhash64(lit(1), col("shingle")))
    def rotl(c: Column, i: Int): Column =
      if (i == 0) c
      else shiftleft(c, i).bitwiseOR(shiftrightunsigned(c, 64 - i))
    val mins = (0 until numHashes).map(i =>
      min(col("h1").bitwiseXOR(rotl(col("h2"), i))).as(s"h$i"))
    postings
      .groupBy(col("doc_id"), col("sh_size"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), col("sh_size"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH band hashes from a signature column: one hash per r-slice
    * (static slices — cheap per-row expressions).
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** MinHash+LSH near-dup pairs, exact-verified.
    *
    * Candidates: docs sharing any of `bands` band hashes (equi-join on
    * (band_idx, band_hash) — never all-pairs). Verification: exact
    * shingle-set Jaccard >= num/den on candidates only, so false
    * positives are impossible. With bands=16, rowsPerBand=4 the miss
    * probability is (1-j^4)^16: ~2e-4 at j=0.80, ~4e-12 at j=0.95 —
    * and exactly 0 for identical sets (identical signatures). The
    * DuckDB oracle computes the exact >=0.8 pair set.
    */
  def minhashPairs(
      docs: DataFrame,
      n: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      thresholdNum: Int = 4,
      thresholdDen: Int = 5): DataFrame = {
    val postings = postingsOf(docs, n)
    val sigs = minhashSigsFromPostings(postings, bands * rowsPerBand)
      .withColumn("bands", lshBands(col("sig"), bands, rowsPerBand))
    // persisted: the signature aggregation would otherwise run once
    // per side of the band-bucket self-join.
    val buckets = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = buckets.as("x")
      .join(buckets.as("y"), Seq("band_idx", "band_hash"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    finalized(verifyPairs(cand, postings, thresholdNum, thresholdDen),
      buckets, postings)
  }

  /** Cross-corpus near-dup dedup — the "dedup the new crawl against
    * the previous dump" stage: every `fresh` doc whose shingle
    * Jaccard with ANY `frozen` doc reaches num/den is dropped;
    * `frozen` is never touched. Candidates come from a band
    * equi-join BETWEEN the two corpora's LSH tables only —
    * frozen×frozen and fresh×fresh pairs are never generated (the
    * within-corpus pair families cover those) — and every candidate
    * exact-verifies across the two postings tables, so false drops
    * are impossible and misses inherit [[minhashPairs]]'
    * (1−j^r)^b envelope (0 for identical sets). Returns the
    * SURVIVING fresh doc_ids (single column; dropped docs are the
    * complement). Scale shape: two signature aggregations (map-side
    * partial mins), one band-bucket equi-join across corpora, one
    * postings-join verify over candidates only, one anti-join.
    */
  def crossDedupSurvivors(frozen: DataFrame, fresh: DataFrame, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 4,
      thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    val postA = postingsOf(frozen, n)
    val postB = postingsOf(fresh, n)
    def bucketsOf(post: DataFrame) =
      minhashSigsFromPostings(post, bands * rowsPerBand)
        .withColumn("bands", lshBands(col("sig"), bands, rowsPerBand))
        .select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val cand = bucketsOf(postB).withColumnRenamed("doc_id", "doc_b")
      .join(bucketsOf(postA).withColumnRenamed("doc_id", "doc_a"),
        Seq("band_idx", "band_hash"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val hit = verifyPairsAcross(cand, postA, postB, thresholdNum, thresholdDen)
      .select(col("doc_b").as("doc_id")).distinct()
    finalized(
      fresh.select(col("doc_id")).join(hit, Seq("doc_id"), "left_anti"),
      postA, postB)
  }

  /** Benchmark decontamination: for every candidate doc, the number
    * of distinct n-gram shingles it shares with the benchmark corpus
    * (docs with any overlap are the contamination set a training
    * pipeline drops or flags). One equi-join of the candidate
    * inverted index against the benchmark's distinct shingle set —
    * partitioned by shingle at any corpus size, no pair explosion;
    * the benchmark side is typically small (eval sets) and
    * broadcast-joins.
    */
  def contaminationOverlap(docs: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val candidates = postingsOf(docs, n)
    val benchShingles = shingleSets(benchmark, n)
      .select(explode(col("sh")).as("shingle")).distinct()
    candidates.join(benchShingles, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_shingles"))
  }

  /** [[contaminationOverlap]] with a bloom prefilter on the candidate
    * postings — the 100 TB shape. The exact path shuffles EVERY
    * candidate shingle toward the join even though almost none match
    * a benchmark (eval sets are tiny next to a training corpus). Here
    * one pass over the benchmark shingles builds a ~MB bloom sketch
    * of their 64-bit hashes; the candidate scan drops non-members
    * through the codegen'd probe BEFORE any exchange, and only the
    * ~fpp survivors enter the exact equi-join that removes the false
    * positives. Blooms have no false negatives and the terminal join
    * is the same exact join, so prefilter∘join ≡ join — the gate
    * hash-checks this path against the plain-join oracle. The hash
    * (xxhash64) never crosses the engine boundary: it exists only
    * inside the sketch, and collisions are just extra false positives
    * killed by the exact join.
    */
  def contaminationOverlapBloom(docs: DataFrame, benchmark: DataFrame, n: Int,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val candidates = postingsOf(docs, n)
    val benchShingles = shingleSets(benchmark, n)
      .select(explode(col("sh")).as("shingle")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = BloomJoin.buildSketch(
      benchShingles.select(xxhash64(col("shingle")).as("h")),
      "h", expectedItems, fpp)
    candidates
      .filter(graft.functions.BloomExprs.might_contain_long(
        xxhash64(col("shingle")), sketch))
      .join(benchShingles, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_shingles"))
  }

  /** Collapse near-dup pairs into canonical groups: every doc in the
    * pair graph maps to the minimum doc_id in its connected component
    * — the survivor a dedup pipeline keeps (everything else drops).
    *
    * Large-star/small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). The edge set is
    * kept in canonical (larger → smaller) direction and each round
    * applies:
    *   large-star(u): m = min(Γ(u) ∪ {u}); relink every STRICTLY
    *     LARGER neighbor v > u to m — emit (v, m);
    *   small-star(u): over the canonical edges (all dst < src),
    *     m = min(dst); relink src and every other dst to m.
    * Both preserve connectivity and never link across components
    * (every emitted edge joins two members of the same component),
    * and the alternation provably converges in O(log² n) rounds —
    * in practice a handful even for shuffled-id chains, because
    * unlike naive pointer-jumping the relink target is the
    * NEIGHBORHOOD min, which cannot plateau at a local minimum.
    * The fixpoint is a disjoint union of stars, each rooted at its
    * component's min id. Non-convergence FAILS LOUDLY rather than
    * returning partial groups. Per-round driver actions are bounded
    * counts, never data collects — each round is two groupBy-joins
    * partitioned by node id at any scale.
    *
    * Each round's edge set is localCheckpoint'ed (eager), truncating
    * the lineage: without it round N's plan nests round N-1's several
    * times, so deep graphs hit exponential analyzer cost — found by
    * the NearDupSpec random-graph property test. The PREVIOUS round's
    * checkpoint blocks are released eagerly once the next round is
    * materialized (see [[releaseCheckpoint]]), so a long iteration
    * holds at most two rounds of edges in the block store, not the
    * whole history.
    */
  def canonicalize(pairs: DataFrame, maxIters: Int = 32): DataFrame = {
    val nodes = roundCheckpoint(pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct())
    var e = roundCheckpoint(pairs
      .where(col("doc_a") =!= col("doc_b"))
      .select(
        greatest(col("doc_a"), col("doc_b")).as("src"),
        least(col("doc_a"), col("doc_b")).as("dst"))
      .distinct())
    // Fixpoint test on the CURRENT edge set, not on next == current:
    // the alternation's fixpoints are exactly the disjoint unions of
    // min-rooted stars (Kiveris et al. §3) — i.e. no node is the
    // source of two edges, and no node is both a source (member) and
    // a destination (root). Checking that directly is one cheap
    // role-count aggregate per round and, unlike the next==current
    // comparison, never pays a whole extra contraction round just to
    // observe that nothing changed.
    def isStarUnion(edges: DataFrame): Boolean = {
      val roles = edges.select(col("src").as("n"), lit(1L).as("s"), lit(0L).as("d"))
        .union(edges.select(col("dst").as("n"), lit(0L).as("s"), lit(1L).as("d")))
      roles.groupBy("n").agg(sum("s").as("s"), sum("d").as("d"))
        .where(col("s") > 1 || (col("s") >= 1 && col("d") >= 1))
        .isEmpty
    }
    var iters = 0
    var converged = isStarUnion(e)
    while (!converged && iters < maxIters) {
      val next = roundCheckpoint(smallStar(largeStar(e)))
      releaseCheckpoint(e)
      e = next
      iters += 1
      converged = isStarUnion(e)
    }
    require(converged, s"star contraction did not converge in $maxIters rounds")
    // Fixpoint edges are (member → root) stars; roots and isolated
    // nodes (self-pairs) label themselves.
    val labels = nodes
      .join(e.select(col("src").as("doc_id"), col("dst").as("root")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("canonical_id"))
    val out = finalized(labels)
    releaseCheckpoint(e)
    releaseCheckpoint(nodes)
    out
  }

  /** Large-star round: every node relinks its strictly-larger
    * neighbors to the min of its closed neighborhood. Input is a
    * canonical (src > dst) distinct edge set; output is canonical but
    * MAY carry duplicates — [[smallStar]]'s terminal distinct (and
    * its map-side-combining groupBy) absorbs them, so paying an
    * extra exchange here to dedupe early would only repeat the same
    * shuffle volume one operator sooner (measured: one fewer
    * exchange per contraction round).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min("dst").as("mn"))
    sym.join(mins, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("u"), least(col("mn"), col("src")).as("v"))
      .where(col("u") =!= col("v"))
      .select(col("u").as("src"), col("v").as("dst"))
  }

  /** Small-star round: the canonical direction already groups each
    * edge under its larger endpoint, so each node relinks itself and
    * its smaller neighbors to their min. Output stays canonical
    * (src > dst, no self-loops) by construction.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("src").agg(min("dst").as("mn"))
    val center = mins.select(col("src"), col("mn").as("dst"))
    val leaves = e.join(mins, "src")
      .where(col("dst") =!= col("mn"))
      .select(col("dst").as("src"), col("mn").as("dst"))
    center.union(leaves).distinct()
  }

  /** Per-round checkpoint policy. `localCheckpoint(true)` keeps round
    * state in the executor block store — the fast choice on local[n],
    * but it is NOT fault-tolerant: lose an executor mid-iteration on a
    * real cluster and the truncated lineage cannot recompute. When the
    * session has a checkpoint dir configured
    * (`sc.setCheckpointDir(...)`, pointing at HDFS/object storage in
    * production), rounds checkpoint RELIABLY there instead; each
    * round's files are deleted as soon as the next round materializes
    * (see [[releaseCheckpoint]]), so the footprint stays at two rounds
    * of edges either way. The eager flag holds for both paths.
    */
  private[graft] def roundCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // persist before a reliable checkpoint, per RDD.checkpoint's own
      // contract: the checkpoint files are written by a SECOND job
      // re-running the lineage after the eager action, so an
      // unpersisted round computes its two shuffles twice — on exactly
      // the cluster path this mode exists for. The cache is dropped as
      // soon as the checkpoint files are on stable storage.
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint(eager = true)
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint(true)

  /** Eagerly free the storage behind a round checkpoint.
    * `Dataset.unpersist` only clears CacheManager entries, not the
    * checkpoint's persisted RDD, which otherwise lives until GC +
    * ContextCleaner get to it — too lazy for an iterative algorithm
    * that checkpoints every round. Local checkpoints free block-store
    * blocks; reliable ones also delete their `rdd-<id>` directory
    * (safe once the next round is materialized — nothing recomputes
    * through a released round).
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach { rdd =>
      rdd.unpersist(blocking = false)
      rdd.getCheckpointFile.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(path, true)
      }
    }

  /** SimHash signature width: 60 bits — the token hash is the first
    * 15 hex digits of md5(token), a hash both Spark (`conv`) and the
    * DuckDB oracle (`('0x'||substr(md5(x),1,15))::BIGINT`) compute
    * bit-identically, which is what lets the gate hash-check the
    * actual signatures and pair set instead of settling for a
    * rows-only check. (xxhash64 would be marginally cheaper but is
    * not reproducible outside the JVM.)
    */
  val simhashBits = 60

  /** Frequency-weighted 60-bit SimHash signatures per doc: bit b is
    * set iff the ±1 vote sum over token occurrences (by bit b of the
    * md5-derived token hash) is >= 0. Computed as one explode + a
    * single 60-counter hash aggregation (partial-agg friendly:
    * per-partition vote sums combine before the shuffle).
    */
  def simhashSigs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(Text.tokens(col(textCol))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until simhashBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
        .as(s"b$b"))
    val counted = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until simhashBits)
      .map(b => when(col(s"b$b") >= 0L, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    counted.select(col("doc_id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist.
    * Blocking: split the 60-bit signature into (maxDist+1) chunks —
    * by pigeonhole, any pair within maxDist shares at least one exact
    * chunk, so candidates come from an equi-join on (chunk_idx,
    * chunk_value); the full cross product never exists.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val chunks = maxDist + 1
    val width = simhashBits / chunks
    val sigs = simhashSigs(docs, idCol, textCol)
    val chunkCols = (0 until chunks).map(i =>
      shiftrightunsigned(col("sig"), i * width).bitwiseAND(lit((1L << width) - 1)))
    // persisted: the 64-counter simhash aggregation would otherwise
    // run once per side of the chunk self-join.
    val keyed = sigs.select(col("doc_id"), col("sig"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk_val")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    finalized(
      keyed.as("x").join(keyed.as("y"), Seq("chunk_idx", "chunk_val"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= maxDist),
      keyed)
  }

  /** Per-document duplicated-n-gram statistics (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * ACL'22 §4: documents whose n-grams recur across the corpus are
    * near-duplicate or boilerplate-heavy and hurt LM training). For
    * each doc: distinct n-gram count, how many of those n-grams occur
    * in at least `minDocs` documents corpus-wide, and the duplicated
    * fraction.
    *
    * Scale: two shuffles, both keyed — document frequency is a
    * map-side-combining count by n-gram, and the join back
    * repartitions by n-gram then re-aggregates by doc_id. Shingles
    * within a doc are distinct ([[Text.shingles]]), so `count` IS the
    * document frequency — no `countDistinct` expand. At 100 TB the
    * n-gram strings themselves would be replaced by a 128-bit hash as
    * the shuffle key; the string form is kept here because the gate's
    * DuckDB oracle must rebuild identical keys. Docs shorter than n
    * tokens have no shingles and drop out (mirrored in the oracle).
    * `dup_ratio` is one IEEE division of two exact BIGINTs — the only
    * double, bit-identical across engines.
    */
  def dupNgramStats(docs: DataFrame, n: Int = 3, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (result, sh) = dupNgramStatsFrames(docs, n, minDocs, idCol, textCol)
    finalized(result, sh)
  }

  /** The un-checkpointed (result, cached-shingles) pair —
    * package-visible so PlanSpec can assert on the REAL physical plan
    * (the public method's eager localCheckpoint reduces its visible
    * plan to an RDD scan).
    */
  private[graft] def dupNgramStatsFrames(docs: DataFrame, n: Int, minDocs: Int,
      idCol: String, textCol: String): (DataFrame, DataFrame) = {
    // persisted: the exploded shingle stream feeds both the document-
    // frequency aggregation and the join back — without it the corpus
    // is shingled twice.
    val sh = docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(Text.shinglesFromTokens(col("toks"), n)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val result = sh.join(docFreq, "sh")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("n_dup_shingles"))
      .withColumn("dup_ratio",
        col("n_dup_shingles").cast("double") / col("n_shingles"))
    (result, sh)
  }

  /** Edit-distance near-dup pairs on fixed-length document heads —
    * fuzzy matching where token-set measures are blind (character
    * typos, small rewrites). Returns (doc_a < doc_b, dist) for every
    * pair of docs of at least `headLen` chars whose first `headLen`
    * characters are within Levenshtein distance `maxDist`.
    *
    * Candidate generation is LOSSLESS, never all-pairs, via the
    * PassJoin segment partition (Li, Deng, Feng: "PASS-JOIN: A
    * Partition-based Method for Similarity Joins", PVLDB 5(3) 2011):
    * split each head into k+1 segments; at most k edit operations
    * touch at most k segments, so for any pair within distance k at
    * least one segment of `a` survives untouched and appears in `b`
    * EXACTLY, shifted by the net indels before it — at most ±k from
    * its home position. Candidates therefore come from an equi-join
    * of (segment_idx, segment_string) against the ±k-shifted
    * substring extractions of every other head — 6 seg rows and
    * ≤ (k+1)(2k+1) substring rows per doc, partitioned by the string
    * key at any corpus size. A q-gram prefix filter was tried first
    * and measured nearly useless on repetitive corpora (the gate's
    * 31-word synthetic vocabulary left only 783 distinct 3-grams at
    * sf0.1 → 7.7M candidates); PassJoin's position-anchored segments
    * stay selective because a hot substring must ALSO sit at the same
    * segment index within ±k characters.
    *
    * Verification is banded `levenshtein(a, b, threshold)` — O(k·L)
    * per candidate, and -1 (dropped) as soon as the band exceeds k.
    */
  def editDistancePairs(docs: DataFrame, headLen: Int = 80, maxDist: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (result, heads) = editDistancePairsFrames(docs, headLen, maxDist, idCol, textCol)
    finalized(result, heads)
  }

  /** Un-checkpointed (result, cached-heads) pair — package-visible for
    * PlanSpec (see [[dupNgramStatsFrames]]).
    */
  private[graft] def editDistancePairsFrames(docs: DataFrame, headLen: Int, maxDist: Int,
      idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val nSeg = maxDist + 1
    require(headLen >= nSeg, s"need headLen >= maxDist+1, got $headLen < $nSeg")
    val baseLen = headLen / nSeg
    val rem = headLen % nSeg
    // even partition, longer segments first: starts are 1-based
    val bounds = {
      var s = 1
      (0 until nSeg).map { i =>
        val l = baseLen + (if (i < rem) 1 else 0)
        val b = (s, l); s += l; b
      }
    }
    val heads = docs
      .filter(length(col(textCol)) >= headLen)
      .select(col(idCol).as("doc_id"),
        substring(col(textCol), 1, headLen).as("head"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segStructs = bounds.zipWithIndex.map { case ((s, l), i) =>
      struct(lit(i).as("idx"), substring(col("head"), s, l).as("str"))
    }
    val segs = heads
      .select(col("doc_id"), explode(array(segStructs: _*)).as("g"))
      .select(col("doc_id"), col("g.idx").as("idx"), col("g.str").as("str"))
    val subStructs = bounds.zipWithIndex.flatMap { case ((s, l), i) =>
      (math.max(s - maxDist, 1) to math.min(s + maxDist, headLen - l + 1)).map { st =>
        struct(lit(i).as("idx"), substring(col("head"), st, l).as("str"))
      }
    }
    val subs = heads
      .select(col("doc_id"), explode(array(subStructs: _*)).as("g"))
      .select(col("doc_id"), col("g.idx").as("idx"), col("g.str").as("str"))
      .distinct() // overlapping shifts often repeat a string — join once
    val candidates = segs.as("x").join(subs.as("y"), Seq("idx", "str"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    val result = candidates
      .join(heads.select(col("doc_id").as("doc_a"), col("head").as("head_a")), "doc_a")
      .join(heads.select(col("doc_id").as("doc_b"), col("head").as("head_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("head_a"), col("head_b"), maxDist).cast("long").as("dist"))
      .filter(col("dist") >= 0)
    (result, heads)
  }

  /** Corpus-level segment deduplication — the CCNet/RefinedWeb "line
    * dedup" stage (Wenzek et al. 2020; Penedo et al. 2023)
    * re-expressed for documents without line structure: the token
    * stream is cut into fixed `segWords`-word segments, each DISTINCT
    * segment keeps only its first corpus occurrence (ordered by
    * doc_id, then segment position — a total order, so the keep-set
    * is deterministic), and every document is reassembled from its
    * surviving segments in original order. Documents whose every
    * segment occurred earlier drop out entirely (the fully-boilerplate
    * case). Returns (doc_id, text_deduped, segs_kept).
    *
    * Scale shape: one explode (Σ segments ≈ tokens/segWords rows),
    * then first-occurrence selection as a `min(struct(doc_id,
    * seg_idx, seg))` aggregate keyed on the segment's 128-bit md5 —
    * the same hash-only shuffle discipline as the streaming twin
    * ([[graft.streaming.SegmentIngest]]): the exchange key is a
    * fixed-width hash, never segment text, and partial aggregation
    * collapses every duplicate occurrence map-side BEFORE the
    * shuffle, so a hyper-common segment ships one winner struct per
    * input partition instead of hot-partitioning a per-key sort (the
    * row_number-window failure mode on exactly the boilerplate-heavy
    * corpora this op targets). Then a per-doc reassembly aggregation
    * whose groups are doc-bounded. Two keyed shuffles, no joins,
    * nothing driver-side.
    */
  def segmentDedup(docs: DataFrame, segWords: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    reassemble(
      segmentsOf(docs, segWords, idCol, textCol)
        // struct min orders (doc_id, seg_idx) exactly like the keep-
        // first total order; seg is constant within a hash group and
        // rides as payload of the single surviving struct
        .groupBy(md5(col("seg")).as("seg_h"))
        .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("w"))
        .select(col("w.doc_id").as("doc_id"),
          col("w.seg_idx").as("seg_idx"), col("w.seg").as("seg")))

  /** Boilerplate segment scrub — the frequency-threshold twin of
    * [[segmentDedup]] (the CCNet boilerplate-paragraph filter): a
    * segment occurring more than `maxFreq` times corpus-wide is
    * treated as template/boilerplate text and removed from EVERY
    * document, first occurrence included — headers, cookie banners,
    * licence blocks. Where keep-first dedup preserves one canonical
    * copy, a boilerplate segment has no canonical home: all copies
    * are noise. Documents that were wholly boilerplate drop out.
    * Returns (doc_id, text_clean, segs_kept).
    *
    * Scale shape: corpus-wide counts are a count aggregate keyed on
    * the segment's 128-bit md5 (hash-only exchange, partial counts
    * merge map-side — a million-copy boilerplate segment ships one
    * partial count per input partition, never a million text rows to
    * one reducer), the OVER-threshold hash set that survives the
    * filter is tiny by construction (boilerplate is few distinct
    * values however high its multiplicity), so the removal anti-join
    * broadcasts under AQE and the segment stream itself never
    * shuffles for it; reassembly is the usual doc-bounded shuffle.
    */
  def boilerplateScrub(docs: DataFrame, segWords: Int = 10,
      maxFreq: Long = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val segs = segmentsOf(docs, segWords, idCol, textCol)
      .withColumn("seg_h", md5(col("seg")))
    val over = segs
      .groupBy(col("seg_h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > maxFreq)
      .select(col("seg_h"))
    reassemble(
      segs.join(over, Seq("seg_h"), "left_anti")
        .select(col("doc_id"), col("seg_idx"), col("seg")))
      .withColumnRenamed("text_deduped", "text_clean")
  }

  /** The (doc_id, seg_idx, seg) segment stream both [[segmentDedup]]
    * and the streaming ingest twin ([[graft.streaming.SegmentIngest]])
    * cut: fixed `segWords`-word windows over the token stream, last
    * segment possibly short, >= 1 segment per doc.
    */
  private[graft] def segmentsOf(docs: DataFrame, segWords: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nSegs = floor((size(col("toks")) + lit(segWords - 1)) / lit(segWords))
    docs
      .select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .withColumn("seg_idx", explode(sequence(lit(0L), nSegs.cast("long") - 1)))
      .select(col("doc_id"), col("seg_idx"),
        concat_ws(" ", slice(col("toks"),
          (col("seg_idx") * segWords).cast("int") + 1, lit(segWords))).as("seg"))
  }

  /** Rebuild (doc_id, text_deduped, segs_kept) from surviving
    * segments, original order; docs with no surviving segments
    * disappear. Per-group state is doc-bounded.
    */
  private[graft] def reassemble(segs: DataFrame): DataFrame =
    segs.groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), " ").as("text_deduped"),
        count(lit(1)).as("segs_kept"))

  /** Duplicated-SPAN scrub — the exact-substring dedup of Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models
    * Better") at word granularity: every OVERLAPPING length-`k` token
    * window that occurs more than once corpus-wide keeps only its
    * first occurrence (total order: doc_id, then start position);
    * every other occurrence marks its `k` covered token positions for
    * removal, covered sets union across overlapping windows, and each
    * document is rebuilt from its surviving tokens in original order.
    * Documents whose every token is covered drop out. Unlike
    * [[segmentDedup]] (fixed non-overlapping tiles, so a one-word
    * shift defeats it), the sliding window catches a duplicated
    * passage at ANY alignment — this is the "suffix-array dedup"
    * stage of the modern LLM curation stack, re-expressed as three
    * keyed shuffles instead of a suffix automaton.
    *
    * Returns (doc_id, text_scrubbed, kept_tokens).
    *
    * Scale shape: the window stream is ~tokens rows (one per start
    * position), immediately reduced to (doc_id, pos, gram_h) — a
    * 128-bit md5 per gram, so no exchange ever carries window TEXT
    * (the [[graft.streaming.SpanIngest]] hash-only discipline).
    * First-occurrence selection is a `min(struct(doc_id, pos))`
    * aggregate keyed on gram_h with a duplicate-count guard: partial
    * aggregation collapses every occurrence of a gram map-side before
    * the shuffle (one winner + one partial count per input partition,
    * vs the row_number window's hot-partition per-key SORT of the full
    * duplicate mass), and grams seen once — the vast majority — drop
    * out of the `firsts` side entirely. The non-first occurrences
    * come back from ONE equi-join of the hashed gram stream against
    * that duplicated-grams-only table (broadcast when the duplicated
    * set is small, plain hash join otherwise — a probe, not a sort,
    * on any skew). Covered positions are ≤ k·duplicates rows, deduped
    * by (doc, pos); the anti-join and reassembly shuffle on
    * doc-bounded keys; nothing driver-side.
    */
  def spanScrub(docs: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = spanGramsOf(docs, k, idCol, textCol)
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("gram_h"))
    val firsts = grams
      .groupBy(col("gram_h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1) // unique grams scrub nothing
      .select(col("gram_h"), col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val covered = grams.join(firsts, Seq("gram_h"))
      .filter(!(col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tokpos"))
      .distinct()
    scrubRebuild(spanTokensOf(docs, idCol, textCol), covered)
  }

  /** The (doc_id, pos, gram) OVERLAPPING k-token window stream both
    * [[spanScrub]] and the streaming ingest twin
    * ([[graft.streaming.SpanIngest]]) scan: one window per start
    * position 0..n−k, none for docs shorter than k tokens.
    */
  private[graft] def spanGramsOf(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, s"span width k=$k must be >= 2")
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), (size(col("toks")) - k).cast("long"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("toks"), col("pos").cast("int") + 1, lit(k))).as("gram"))
  }

  /** The positioned token stream (doc_id, pos, tok), pos 0-based. */
  private[graft] def spanTokensOf(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))

  /** Drop `covered` (doc_id, tokpos) positions from the token stream
    * and rebuild (doc_id, text_scrubbed, kept_tokens) in original
    * order; fully-covered docs disappear. The anti-join and the
    * reassembly both shuffle on doc-bounded keys.
    */
  private[graft] def scrubRebuild(toksPos: DataFrame, covered: DataFrame): DataFrame = {
    val kept = toksPos.join(covered,
      toksPos("doc_id") === covered("doc_id") &&
        toksPos("pos").cast("long") === covered("tokpos"),
      "left_anti")
    kept.groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("text_scrubbed"),
        count(lit(1)).as("kept_tokens"))
  }
}
