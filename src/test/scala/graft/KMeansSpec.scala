package graft

import graft.ops.KMeans

/** Exact quantized Lloyd step vs an independent in-memory reference
  * (the NearDupSpec-vs-BFS pattern): same grid, same init, same
  * integer round-half-up centroid update, computed with plain Scala
  * collections — plus the Lloyd monotonicity theorem.
  */
class KMeansSpec extends SparkSuite {

  private val k = 10
  private val scale = 65536L

  // round-half-away-from-zero: what Spark round() (BigDecimal
  // HALF_UP) and DuckDB round() both do on doubles
  private def q(x: Double): Long =
    (if (x >= 0) math.floor(x * scale + 0.5) else math.ceil(x * scale - 0.5)).toLong

  test("distributed Lloyd step equals the in-memory reference and never raises the objective") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = KMeans.lloydRefine(emb, k = k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val raw: Map[Long, Array[Long]] = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => q(x.toDouble)).toArray).toMap
    val init: IndexedSeq[Array[Long]] =
      raw.keys.toIndexedSeq.sorted.take(k).map(raw)

    def dist(x: Array[Long], c: Array[Long]): Long =
      x.indices.map { d => val t = x(d) - c(d); t * t }.sum
    def assign(cents: IndexedSeq[Array[Long]])(x: Array[Long]): (Int, Long) =
      cents.indices.map(i => (dist(x, cents(i)), i)).min match {
        case (d, i) => (i, d)
      }

    val a0 = raw.map { case (id, x) => id -> assign(init)(x) }
    val refined = (0 until k).map { i =>
      val members = raw.collect { case (id, x) if a0(id)._1 == i => x }
      if (members.isEmpty) init(i)
      else {
        val n = BigInt(members.size)
        init(i).indices.map { d =>
          val s = members.map(x => BigInt(x(d))).sum
          val num = 2 * s + n
          val den = 2 * n
          ((num - num.mod(den)) / den).toLong
        }.toArray
      }
    }
    val a1 = raw.map { case (id, x) => id -> assign(refined)(x) }

    assert(got.keySet === raw.keySet)
    raw.keys.foreach { id =>
      assert(got(id) === ((a0(id)._1.toLong, a1(id)._1.toLong)), s"vec $id")
    }
    // one Lloyd step strictly improves or holds the quantized
    // objective (reassign-then-recenter can only lower Σ d²)
    val obj0 = a0.values.map(v => BigInt(v._2)).sum
    val obj1 = a1.values.map(v => BigInt(v._2)).sum
    assert(obj1 <= obj0, s"objective rose: $obj0 -> $obj1")
    // the step actually does something on this corpus
    assert(raw.keys.exists(id => got(id)._1 != got(id)._2))
  }

  test("PQ codes equal the in-memory reference; init vectors encode at zero error") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = 16; val nCells = 64
    val got = KMeans.pqCodes(emb, m = m, k = nCells).collect()
      .map(r => r.getLong(0) -> (0 until m).map(s => r.getLong(1 + s))).toMap

    val raw: Map[Long, Array[Long]] = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => q(x.toDouble)).toArray).toMap
    val init = raw.keys.toIndexedSeq.sorted.take(nCells).map(raw)
    val sub = init.head.length / m
    def code(x: Array[Long], s: Int): (Long, Long) =
      (0 until nCells).map { c =>
        val d = (s * sub until (s + 1) * sub)
          .map { i => val t = x(i) - init(c)(i); t * t }.sum
        (d, c.toLong)
      }.min
    assert(got.keySet === raw.keySet)
    raw.foreach { case (id, x) =>
      val expect = (0 until m).map(s => code(x, s)._2)
      assert(got(id) === expect, s"vec $id")
    }
    // every init vector's own subvectors sit in the codebook, so its
    // reconstruction error is exactly zero in every subspace
    raw.keys.toSeq.sorted.take(nCells).foreach { id =>
      (0 until m).foreach { s => assert(code(raw(id), s)._1 === 0L, s"vec $id s=$s") }
    }
  }

  test("ADC KNN equals the in-memory reference ranking") {
    val emb = Tables.embeddings(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val m = 16; val nCells = 64; val topK = 5
    val got = KMeans.adcKnn(emb, emb.filter(col("vec_id") < 10), topK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val raw: Map[Long, Array[Long]] = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => q(x.toDouble)).toArray).toMap
    val init = raw.keys.toIndexedSeq.sorted.take(nCells).map(raw)
    val sub = init.head.length / m
    def subDist(x: Array[Long], c: Int, s: Int): Long =
      (s * sub until (s + 1) * sub).map { i => val t = x(i) - init(c)(i); t * t }.sum
    val codes: Map[Long, IndexedSeq[Int]] = raw.map { case (id, x) =>
      id -> (0 until m).map(s => (0 until nCells).map(c => (subDist(x, c, s), c)).min._2)
    }
    val expect = (0L until 10L).flatMap { qid =>
      val lut = Array.tabulate(m, nCells)((s, c) => subDist(raw(qid), c, s))
      raw.keys.filter(_ != qid).toSeq
        .map(v => (codes(v).zipWithIndex.map { case (c, s) => lut(s)(c) }.sum, v))
        .sorted.take(topK).zipWithIndex
        .map { case ((_, v), r) => (qid, (r + 1).toLong, v) }
    }.toSet
    assert(got === expect)
  }

  test("IVFADC equals the in-memory reference ranking") {
    val emb = Tables.embeddings(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val m = 16; val coarseK = 8; val nCells = 64; val nprobe = 4; val topK = 5
    val got = KMeans.ivfAdcKnn(emb, emb.filter(col("vec_id") < 10), topK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val raw: Map[Long, Array[Long]] = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => q(x.toDouble)).toArray).toMap
    val ids = raw.keys.toIndexedSeq.sorted
    val coarse = ids.take(coarseK).map(raw)
    def sqd(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map { i => val t = a(i) - b(i); t * t }.sum
    def cellOf(v: IndexedSeq[Long]): Int =
      coarse.indices.map(c => (sqd(v, coarse(c)), c)).min._2
    val cells: Map[Long, Int] = raw.map { case (id, v) => id -> cellOf(v.toIndexedSeq) }
    def residual(id: Long): IndexedSeq[Long] = {
      val v = raw(id); val cc = coarse(cells(id))
      v.indices.map(i => v(i) - cc(i))
    }
    val subCB = ids.take(nCells).map(residual)
    val dim = coarse.head.length
    val sub = dim / m
    def subSqd(a: IndexedSeq[Long], b: IndexedSeq[Long], s: Int): Long =
      (s * sub until (s + 1) * sub).map { i => val t = a(i) - b(i); t * t }.sum
    val codes: Map[Long, IndexedSeq[Int]] = raw.keys.map { id =>
      val r = residual(id)
      id -> (0 until m).map(s => subCB.indices.map(c => (subSqd(r, subCB(c), s), c)).min._2)
    }.toMap
    val expect = (0L until 10L).flatMap { qid =>
      val qv = raw(qid).toIndexedSeq
      val probed = coarse.indices.map(c => (sqd(qv, coarse(c)), c)).sorted
        .take(nprobe).map(_._2).toSet
      val cand = raw.keys.filter(v => v != qid && probed(cells(v))).toSeq.map { v =>
        val qr = Array.tabulate(dim)(i => qv(i) - coarse(cells(v))(i)).toIndexedSeq
        val adc = (0 until m).map(s => subSqd(qr, subCB(codes(v)(s)), s)).sum
        (adc, v)
      }
      cand.sorted.take(topK).zipWithIndex.map { case ((_, v), r) => (qid, (r + 1).toLong, v) }
    }.toSet
    assert(got === expect)
  }

  test("PQ approximations recall the exact-L2 neighbors (same metric, same grid)") {
    // NB the baseline must be exact L2 on the quantized grid — the
    // cosine brute-force entry is a different metric on unnormalized
    // vectors and recall against it measures metric disagreement, not
    // quantization loss
    val emb = Tables.embeddings(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val raw: Map[Long, IndexedSeq[Long]] = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => q(x.toDouble)).toIndexedSeq).toMap
    def sqd(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map { i => val t = a(i) - b(i); t * t }.sum
    val exact = (0L until 10L).flatMap { qid =>
      raw.keys.filter(_ != qid).toSeq
        .map(v => (sqd(raw(qid), raw(v)), v)).sorted.take(5)
        .map { case (_, v) => (qid, v) }
    }.toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val queries = emb.filter(col("vec_id") < 10)
    val adc = recall(KMeans.adcKnn(emb, queries, 5))
    val ivfadc = recall(KMeans.ivfAdcKnn(emb, queries, 5))
    info(s"recall vs exact L2: adc=$adc ivfadc=$ivfadc")
    assert(adc >= 0.4, s"ADC recall $adc")
    assert(ivfadc >= 0.25, s"IVFADC recall $ivfadc (cell pruning compounds)")
  }

  test("IVFADC shuffle-by-cell query path (broadcastQueries=false) equals broadcast") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val idx = KMeans.ivfAdcIndex(emb)
    val qs = emb.filter(col("vec_id") < 10)
    def rows(bc: Boolean): Set[(Long, Long, Long)] =
      KMeans.ivfAdcQuery(idx, qs, topK = 5, broadcastQueries = bc).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(bc = false) === rows(bc = true))
  }

  test("IVFADC append with frozen codebooks equals a rebuild; replay adds nothing") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    // the base slice holds every codebook-training id (coarse takes
    // the 8 lowest, sub the 64 lowest), so a from-scratch rebuild on
    // the full corpus trains IDENTICAL codebooks and any difference
    // isolates the append path itself
    val base = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    val appended = KMeans.ivfAdcAppend(KMeans.ivfAdcIndex(base), rest)
    val rebuilt = KMeans.ivfAdcIndex(emb)
    def codesOf(i: KMeans.IvfAdcIndex): Set[Seq[Any]] =
      i.codes.collect().map(_.toSeq).toSet
    assert(codesOf(appended) === codesOf(rebuilt))
    def served(i: KMeans.IvfAdcIndex): Set[(Long, Long, Long)] =
      KMeans.ivfAdcQuery(i, emb.filter(col("vec_id") < 10), topK = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served(appended) === served(rebuilt))
    // at-least-once replay: the same batch re-delivered is a no-op
    val replayed = KMeans.ivfAdcAppend(appended, rest)
    assert(replayed.codes.count() === appended.codes.count())
  }

  test("centroid-update sums survive past the BIGINT edge (DECIMAL on the wire)") {
    import spark.implicits._
    // components sit near the grid's Long ceiling: 16 rows of ~9.1e17
    // sum to ~1.46e19 > Long.MaxValue, so a BIGINT wire sum would turn
    // over; the DECIMAL(38,0) sum must stay exact
    val base = 1.39e13
    val rows = (0 until 16).map(i => (i.toLong, Seq(base + i, base)))
    val got = KMeans.refinedCentroids(rows.toDF("vec_id", "embedding"), k = 1)
    val qv = rows.map { case (_, v) => v.map(x => BigInt(q(x))) }
    assert(qv.map(_(0)).sum > BigInt(Long.MaxValue), "edge case lost its teeth")
    def mean(d: Int): Long = {
      val s = qv.map(_(d)).sum
      val n = BigInt(qv.size)
      val num = 2 * s + n
      val den = 2 * n
      ((num - num.mod(den)) / den).toLong
    }
    assert(got === Seq(Seq(mean(0).toDouble / scale, mean(1).toDouble / scale)))
  }

  test("IVFADC assignment expression size is coarseK-independent; coarseK=64 builds fast") {
    // the residual carries the whole coarse matrix as ONE literal, so
    // growing coarseK must not grow the expression tree (the earlier
    // m×coarseK when-chain did, and its analysis cost exploded)
    def coarseOf(n: Int): Seq[Seq[Long]] =
      Seq.tabulate(n)(c => Seq.tabulate(64)(d => (c * 64 + d).toLong))
    def nodes(c: org.apache.spark.sql.Column): Int =
      org.apache.spark.sql.GraftShim.expression(c).collect { case e => e }.size
    assert(nodes(KMeans.residualCol(coarseOf(64))) ===
      nodes(KMeans.residualCol(coarseOf(8))))
    val subCB = Seq.tabulate(64)(c => Seq.tabulate(64)(d => (c + d).toLong))
    val codeNodes = KMeans.residualCodeCols(subCB, m = 16, sub = 4).map(nodes).sum
    assert(codeNodes < 200, s"code columns grew to $codeNodes nodes")
    // end-to-end: a real-corpus-shaped coarseK builds in seconds, not
    // the minutes the when-chain form cost at this width
    val emb = Tables.embeddings(spark, sfDir)
    val t0 = System.nanoTime()
    KMeans.ivfAdcIndex(emb, coarseK = 64)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"coarseK=64 IVFADC index build: $secs%.2f s")
    assert(secs < 20.0, f"coarseK=64 build took $secs%.2f s")
  }

  test("trained IVF: exhaustive probe equals brute force; usable recall at nprobe=2/10") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Ann
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val trained = KMeans.refinedCentroids(emb, k = k)
    val bf = Ann.bruteForceKnn(emb, queries, 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Ann.ivfKnn(emb, queries, 5, trained, nprobe = k)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === bf, "exhaustive probe over the trained cells must equal brute force")
    val narrow = Ann.ivfKnn(emb, queries, 5, trained, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfPairs = bf.map { case (q, _, n) => (q, n) }
    val recall = (bfPairs & narrow).size.toDouble / bfPairs.size
    assert(recall >= 0.6, s"trained-IVF recall $recall at nprobe=2")
  }

  test("centroidOutliers matches a BigInt brute force of the ranking key") {
    val emb = Tables.embeddings(spark, sfDir)
    val df = KMeans.centroidOutliers(emb, k = 5)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = emb.selectExpr("vec_id", "CAST(label AS BIGINT) AS label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => BigInt(q(x.toDouble)))))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (label, g) =>
      val n = BigInt(g.length)
      val dims = g.head._3.indices
      val s = dims.map(d => g.map(_._3(d)).sum)
      g.map { case (id, _, v) =>
        (id, dims.map(d => v(d) * (n * v(d) - 2 * s(d))).sum)
      }.sortBy { case (id, kk) => (-kk, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (label, id, (i + 1).toLong) }
    }.toSet
    assert(out === expected)
    // per-group rank must stay bounded (WindowGroupLimit), and the
    // (groups × dims) stats side must broadcast, not shuffle the join
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("centroidOutliers: a planted far point is its group's top outlier") {
    import spark.implicits._
    val tiny = Seq(
      (1L, 0, Array.fill(4)(0.01f)),
      (2L, 0, Array.fill(4)(0.02f)),
      (3L, 0, Array.fill(4)(0.5f)),
      (4L, 1, Array.fill(4)(0.1f)),
      (5L, 1, Array.fill(4)(0.1f)),
      (6L, 1, Array.fill(4)(0.9f))).toDF("vec_id", "label", "embedding")
    val top1 = KMeans.centroidOutliers(tiny, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 === Set((0L, 3L), (1L, 6L)))
  }
}
