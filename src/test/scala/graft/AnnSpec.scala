package graft

import org.apache.spark.sql.functions._
import graft.ops.Ann

class AnnSpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sfDir)

  test("brute-force knn: k rows per query, no self-matches, ranks 1..k") {
    val knn = Ann.bruteForceKnn(emb, emb.filter(col("vec_id") < 5), 5)
    val rows = knn.as[(Long, Long, Long)].collect()
    assert(rows.length === 25)
    rows.foreach { case (q, _, n) => assert(q != n) }
    val byQ = rows.groupBy(_._1)
    byQ.values.foreach(g => assert(g.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("truncated knn with candidates = |corpus| equals brute force exactly") {
    // the prefix filter keeps everything, so the pipeline degenerates
    // to the exact full-dim rerank — any divergence is a bug in the
    // two-stage plumbing, not MRL recall loss
    val n = emb.count().toInt
    val q = emb.filter(col("vec_id") < 5)
    val trunc = Ann.truncatedKnn(emb, q, k = 5, prefixDims = 16, candidates = n)
      .as[(Long, Long, Long)].collect().toSet
    val exact = Ann.bruteForceKnn(emb, q, 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(trunc === exact)
  }

  test("truncated knn: the prefix carries signal — recall beats the random-candidate baseline") {
    // the fixture embeddings are RANDOM (no MRL training), so a
    // 16/64 prefix is only an unbiased cosine estimate; the honest
    // claim is recall well above picking 50/|corpus| candidates at
    // random (~0.1 at sf0.001), not the near-1.0 a real MRL encoder
    // gives. Measured ~0.44 on the fixture.
    val q = emb.filter(col("vec_id") < 5)
    val trunc = Ann.truncatedKnn(emb, q, k = 5, prefixDims = 16, candidates = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Ann.bruteForceKnn(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (trunc & exact).size.toDouble / exact.size
    val baseline = 50.0 / emb.count()
    assert(recall >= math.max(0.25, 2 * baseline),
      s"prefix-16 recall $recall not above the random baseline $baseline")
  }

  test("hard negatives: ranked like knn but the near-dup band is excluded") {
    val anchors = emb.filter(col("vec_id") < 5)
    val got = Ann.hardNegatives(emb, anchors, k = 3, maxSim = 0.4)
      .as[(Long, Long, Long)].collect().toSet
    // in-memory reference: cosine over doubles, filter < 0.4, top-3
    val vecs = emb.select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (0L until 5L).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .filter(_._2 < 0.4)
        .sortBy { case (id, s) => (-s, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (q, (i + 1).toLong, id) }
    }.toSet
    assert(got === expected)
    // and none of the returned negatives is a near-dup partner
    val dup = Ann.cosineNearDupPairs(emb, threshold = 0.4)
      .as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    got.foreach { case (q, _, n) => assert(!dup.contains((q, n))) }
  }

  test("IVF recall vs brute force >= 0.6 at nprobe=4/16") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Ann.bruteForceKnn(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val centroids = Ann.coarseCentroids(emb, 16)
    val ivf = Ann.ivfKnn(emb, queries, 5, centroids, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("IVF at nprobe=all cells equals brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val centroids = Ann.coarseCentroids(emb, 8)
    val bf = Ann.bruteForceKnn(emb, queries, 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val ivf = Ann.ivfKnn(emb, queries, 5, centroids, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(ivf === bf)
  }

  test("IVF cell-shuffle mode (broadcastQueries=false) equals broadcast mode") {
    val queries = emb.filter(col("vec_id") < 10)
    val centroids = Ann.coarseCentroids(emb, 16)
    val bcast = Ann.ivfKnn(emb, queries, 5, centroids, nprobe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val shuffled = Ann.ivfKnn(emb, queries, 5, centroids, nprobe = 4,
      broadcastQueries = false)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(shuffled === bcast,
      "the large-query-volume shuffle path must match the broadcast path")
  }

  test("top similar pairs are ordered, unique, upper-triangle") {
    val p = Ann.topSimilarPairs(emb, 20).as[(Long, Long, Long)].collect()
    assert(p.map(_._1).toSeq === (1L to 20L))
    p.foreach { case (_, a, b) => assert(a < b) }
    assert(p.map(x => (x._2, x._3)).distinct.length === 20)
  }

  test("top similar pairs equals the naive theta-join formulation") {
    import graft.functions.Vectors
    val prep = emb.select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val a = prep.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = prep.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val naive = a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .orderBy(col("sim").desc, col("id_a").asc, col("id_b").asc).limit(20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val blocked = Ann.topSimilarPairs(emb, 20)
      .orderBy("rank").select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(blocked === naive)
  }

  test("blocks/nCells defaults derive from shuffle parallelism; results invariant to blocks") {
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // derived value tracks the parallelism knob: smallest grid
      // covering it at local[32] scale and at a 2000-partition cluster
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      assert(Ann.defaultBlocks(spark) === 8)   // 8·9/2 = 36 ≥ 32
      assert(Ann.defaultNumCells(spark) === 32)
      spark.conf.set("spark.sql.shuffle.partitions", "2000")
      assert(Ann.defaultBlocks(spark) === 63)  // 63·64/2 = 2016 ≥ 2000
      assert(Ann.defaultNumCells(spark) === 2000)
    } finally spark.conf.set("spark.sql.shuffle.partitions", sp)
    // the grid size must be invisible in results: derived default and
    // two explicit settings produce the identical ranked pair list
    val derived = Ann.topSimilarPairs(emb, 15)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    for (b <- Seq(4, 19)) {
      val explicit = Ann.topSimilarPairs(emb, 15, blocks = b)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(explicit === derived, s"blocks=$b diverged")
    }
  }

  test("rhp lsh near-dup: in-memory replay of signatures, bands, and verify matches exactly") {
    // replays the WHOLE construction locally (plane derivation, bit
    // comparisons, band buckets, collision candidates, cosine verify)
    // with non-default 16-bit/4-band parameters — the Spark pair set
    // must be bit-identical, approximation included
    val nBits = 16; val bandBits = 4; val thr = 0.35
    val vecs: Map[Long, Array[Double]] = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val low = vecs.keys.toSeq.sorted.take(2 * nBits).map(vecs)
    def sig(v: Array[Double]): Seq[Long] =
      (0 until nBits / bandBits).map { bnd =>
        (0 until bandBits).map { j =>
          val i = bnd * bandBits + j
          if (dot(v, low(2 * i)) >= dot(v, low(2 * i + 1))) 1L << j else 0L
        }.sum
      }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if sigs(a).zip(sigs(b)).exists { case (x, y) => x == y }
      if cos(vecs(a), vecs(b)) >= thr
    } yield (a, b)).toSet
    val got = Ann.rhpNearDupPairs(emb, thr, nBits = nBits, bandBits = bandBits)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    // and it is a SUBSET of the exact pair set (verify step is real)
    val exact = Ann.cosineNearDupPairs(emb, thr).as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact))
  }

  test("rhp lsh near-dup: a planted exact duplicate always collides") {
    // identical vectors get identical signatures, so every band
    // agrees and the pair can never be missed regardless of banding
    val dupId = 1000000L
    val donor = emb.filter(col("vec_id") === 3)
      .select(lit(dupId).as("vec_id"), col("embedding"))
    val planted = emb.select(col("vec_id"), col("embedding")).union(donor)
    val got = Ann.rhpNearDupPairs(planted, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(got.contains((3L, dupId)))
  }

  test("embedding decontamination: survivors match the brute-force reference and partition the corpus") {
    val thr = 0.3
    val bench = emb.filter(col("vec_id") % 50 === 0)
    val train = emb.filter(col("vec_id") % 50 =!= 0)
    val bvecs = bench.collect().map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expected = train.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter { case (_, v) => bvecs.forall(b => cos(v, b) < thr) }
      .map(_._1).toSet
    val got = Ann.decontaminate(train, bench, thr)
      .as[Long].collect().toSet
    assert(got === expected)
    // drops are real on the fixture (the threshold exercises the path)
    assert(got.size < train.count())
    assert(got.nonEmpty)
  }

  test("all-pairs block-grid plan has no cartesian / broadcast-nested-loop join") {
    // assert on the inner scored computation: the public operators
    // checkpoint their (small) results, which would hide the join
    // plan behind an RDD scan.
    val (scored, cached) = Ann.allPairsScored(emb, "vec_id", "embedding", 16)
    try {
      scored.collect() // force execution so AQE finalizes the physical plan
      val plan = scored.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(30).mkString("\n"))
      assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(30).mkString("\n"))
    } finally { cached.unpersist(); () }
  }
}
