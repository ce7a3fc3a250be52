package graft

import org.apache.spark.sql.functions._
import graft.ops.NearDup

/** Near-dup family: LSH candidates vs exact ground truth, simhash on
  * constructed duplicates, fingerprint behavior.
  */
class NearDupSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir)

  test("minhash+LSH pairs equal exact Jaccard>=0.8 pairs on real docs") {
    val exact = NearDup.jaccardPairs(docs, 3, 4, 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = NearDup.minhashPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
  }

  test("crossDedupSurvivors drops only cross-corpus near-dups; within-fresh dups both survive") {
    // frozen: 2 (template), 4 (unique). fresh: 1 (near-dup of 2 —
    // dropped), 3+5 (near-dups of EACH OTHER but of nothing frozen —
    // BOTH survive: this op is cross-only), 7 (unique — survives),
    // 9 (two tokens, no 3-gram shingles — survives by vacuity).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pair = "one two three four five six seven eight nine ten"
    val corpus = Seq(
      (2L, base), (4L, "totally different frozen content words here now"),
      (1L, base + " lambda"), (3L, pair + " eleven"), (5L, pair + " twelve"),
      (7L, "nothing like anything else in this corpus at all exists"),
      (9L, "tiny doc")
    ).toDF("doc_id", "text")
    val frozen = corpus.filter($"doc_id" % 2 === 0)
    val fresh = corpus.filter($"doc_id" % 2 === 1)
    val survivors = NearDup.crossDedupSurvivors(frozen, fresh,
        thresholdNum = 1, thresholdDen = 2)
      .as[Long].collect().toSet
    assert(survivors === Set(3L, 5L, 7L, 9L))
  }

  test("jaccard pairs are symmetric-free (a<b) and above threshold") {
    val rows = NearDup.jaccardPairs(docs, 3, 1, 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (c, sa, sb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(3 * c >= sa + sb) // j >= 1/2 in exact integer form
    }
  }

  test("simhash: identical texts collide, near-identical within distance") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (4L, "completely different content about databases and distributed query engines")
    ).toDF("doc_id", "text")
    val sigs = NearDup.simhashSigs(d).as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 8)
    val pairs = NearDup.simhashPairs(d, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash finds the corpus near-dups that Jaccard>=0.8 finds") {
    val exact = NearDup.jaccardPairs(docs, 3, 4, 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sim = NearDup.simhashPairs(docs, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("exact dup groups: duplicated text maps to one canonical id") {
    val d = Seq((10L, "same text"), (11L, "same text"), (12L, "other")).toDF("doc_id", "text")
    val g = NearDup.exactDupGroups(d).orderBy("canonical_id")
      .select("canonical_id", "n_docs").as[(Long, Long)].collect().toSeq
    assert(g === Seq((10L, 2L), (12L, 1L)))
  }

  test("canonicalize equals BFS connected components on random adversarial graphs") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    // graph shapes that stress label propagation: long chains (maximal
    // diameter), stars (max fan-in), and random sparse edge sets —
    // with ids shuffled so the min label must travel the long way.
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 120)
      shape <- Gen.oneOf("chain", "star", "random")
      perm <- Gen.const(scala.util.Random.shuffle((0L until n.toLong).toList))
      extra <- Gen.listOfN(n / 2, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (perm(a), perm(b)))
    } yield shape match {
      // chain diameters up to 119 with shuffled ids: one hop per
      // round could never converge in maxIters rounds — only the
      // O(log n) star contraction can carry these
      case "chain" => perm.zip(perm.tail)
      case "star"  => perm.tail.map(x => (perm.head, x))
      case _       => extra
    }
    def bfsComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val seen = scala.collection.mutable.Map.empty[Long, Long]
      adj.keys.toSeq.sorted.foreach { start =>
        if (!seen.contains(start)) {
          val comp = scala.collection.mutable.Set(start)
          val queue = scala.collection.mutable.Queue(start)
          while (queue.nonEmpty)
            adj(queue.dequeue()).foreach(nb =>
              if (comp.add(nb)) queue.enqueue(nb))
          val label = comp.min
          comp.foreach(seen(_) = label)
        }
      }
      seen.toMap
    }
    val prop = Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val pairs = edges.toDF("doc_a", "doc_b")
        val got = NearDup.canonicalize(pairs)
          .as[(Long, Long)].collect().toMap
        got == bfsComponents(edges)
      }
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("canonicalize maps chains and separate components to min ids") {
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (4L, 5L), (3L, 4L))
      .toDF("doc_a", "doc_b") // 1-2-3-4-5 chain + {10,11}
    val got = NearDup.canonicalize(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("canonicalize converges on a 60-node chain (star contraction: O(log n) rounds)") {
    // diameter 59 ≫ maxIters: plain per-hop propagation could not
    // converge; star contraction must carry it. Ids reversed so the
    // min label travels the full length.
    val chain = (0L until 59L).map(i => (59L - i, 58L - i)).toDF("doc_a", "doc_b")
    val got = NearDup.canonicalize(chain).as[(Long, Long)].collect().toMap
    assert(got === (0L to 59L).map(_ -> 0L).toMap)
  }

  test("canonicalize converges on a 400-node shuffled-id chain and frees its round checkpoints") {
    // The adversarial shape from the round-4 verdict, at 6x the size
    // the old pointer-jump failed on: a long chain whose ids are
    // shuffled so min-label distance ≈ diameter. Also pins the cache
    // hygiene contract: per-round localCheckpoints are released
    // eagerly, so a long iteration leaves only the finalized result
    // (one checkpoint) in the block store, not one RDD per round.
    val rnd = new scala.util.Random(7)
    val perm = rnd.shuffle((0L until 400L).toVector)
    val chain = perm.zip(perm.tail).toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = NearDup.canonicalize(chain).as[(Long, Long)].collect().toMap
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(got === (0L until 400L).map(_ -> 0L).toMap)
    assert((after -- before).size <= 1,
      s"round checkpoints leaked: ${(after -- before).size} new persistent RDDs")
  }

  test("canonicalize uses reliable round checkpoints when a checkpoint dir is set, and deletes them") {
    // The cluster-mode policy: with sc.setCheckpointDir configured,
    // round state goes to fault-tolerant storage instead of executor
    // blocks (lose an executor mid-iteration and local blocks cannot
    // recompute — the lineage is truncated). Same result either way;
    // each round's rdd-<id> directory is deleted once the next round
    // is materialized, so the dir does not accumulate one snapshot
    // per round. NOTE: the shared session keeps the checkpoint dir
    // for the rest of the JVM (Spark has no unset); later canonicalize
    // calls simply keep exercising the reliable path.
    val ckptDir = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val rnd = new scala.util.Random(11)
    val perm = rnd.shuffle((0L until 300L).toVector)
    val chain = perm.zip(perm.tail).toDF("doc_a", "doc_b")
    val got = NearDup.canonicalize(chain).as[(Long, Long)].collect().toMap
    assert(got === (0L until 300L).map(_ -> 0L).toMap)
    def rddDirs(p: java.io.File): Seq[String] =
      Option(p.listFiles).toSeq.flatten.flatMap { f =>
        if (f.getName.startsWith("rdd-")) Seq(f.getPath)
        else if (f.isDirectory) rddDirs(f) else Nil
      }
    assert(rddDirs(new java.io.File(ckptDir)).isEmpty,
      "reliable round checkpoints were not deleted after convergence")
  }

  test("jaccardPairs (prefix+length+positional filters) equals brute force on random corpora") {
    // The filters are all exactness-preserving by argument; this pins
    // that down empirically across random shapes and both thresholds.
    for (seed <- 1 to 4; (num, den) <- Seq((1, 2), (4, 5))) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      def randText() =
        (0 until (4 + rnd.nextInt(16))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (0L until 25L).map(i => (i, randText()))
      val mutated = (25L until 32L).map { i =>
        val t = base(rnd.nextInt(base.size))._2
        (i, if (rnd.nextBoolean()) t else t + " " + vocab(rnd.nextInt(vocab.size)))
      }
      val corpus = base ++ mutated
      val got = NearDup.jaccardPairs(corpus.toDF("doc_id", "text"), n = 2, num, den)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      val sets = corpus.map { case (id, t) => id -> shingles(t) }.toMap
      val expected = (for {
        a <- corpus.map(_._1); b <- corpus.map(_._1)
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        c = (sets(a) & sets(b)).size
        if c * (den + num) >= num * (sets(a).size + sets(b).size)
      } yield (a, b)).toSet
      assert(got === expected, s"seed=$seed t=$num/$den")
    }
  }

  test("editDistancePairs equals brute-force Levenshtein on random mutated corpora") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcdefgh "
      def randText(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      def mutate(t: String, edits: Int): String = {
        var s = t
        for (_ <- 0 until edits) {
          val i = rnd.nextInt(s.length)
          rnd.nextInt(3) match {
            case 0 => s = s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i + 1)
            case 1 => s = s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
            case 2 => s = s.take(i) + s.drop(i + 1)
          }
        }
        s
      }
      // 85-105-char texts: some fresh, some near-copies 1-8 edits away
      // (straddling the maxDist=5 bar), one SHORT doc that must drop
      val base = (0L until 12L).map(i => (i, randText(85 + rnd.nextInt(20))))
      val near = (12L until 22L).map { i =>
        (i, mutate(base(rnd.nextInt(base.size))._2, 1 + rnd.nextInt(8)))
      }
      val corpus = (base ++ near :+ ((22L, randText(30)))).filter(_._2.length >= 1)
      val got = NearDup.editDistancePairs(corpus.toDF("doc_id", "text"))
        .as[(Long, Long, Long)].collect().toSet
      val heads = corpus.filter(_._2.length >= 80).map { case (id, t) => (id, t.take(80)) }
      val expected = (for {
        (a, ha) <- heads; (b, hb) <- heads if a < b
        d = lev(ha, hb) if d <= 5
      } yield (a, b, d.toLong)).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("dupNgramStats equals an in-memory reference (shared vs unique trigrams)") {
    val corpus = Seq(
      (1L, "a b c d e"),      // trigrams: "a b c","b c d","c d e"
      (2L, "a b c x y"),      // shares "a b c" with doc 1
      (3L, "p q r s"),        // all unique
      (4L, "a b"),            // too short: no trigrams, must drop
      (5L, "a b c d e"))      // exact dup of doc 1: all 3 shared
    val got = NearDup.dupNgramStats(corpus.toDF("doc_id", "text"))
      .select("doc_id", "n_shingles", "n_dup_shingles")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 3L), (2L, 3L, 1L), (3L, 2L, 0L), (5L, 3L, 3L)))
    val ratios = NearDup.dupNgramStats(corpus.toDF("doc_id", "text"))
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(ratios(2L) === 1.0 / 3.0)
    assert(ratios(3L) === 0.0)
  }

  test("segmentDedup equals a sequential first-occurrence reference") {
    // segWords=2 so duplicate segments are easy to plant: doc 1 owns
    // "a b" and "c d"; doc 2 repeats "a b" (dropped) but keeps its
    // tail; doc 3 is built ONLY of earlier segments and must vanish;
    // doc 4 has a short trailing segment ("z") surviving intact.
    val corpus = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "c d e f"),
      (4L, "a b x y z"))
    val got = NearDup.segmentDedup(corpus.toDF("doc_id", "text"), segWords = 2)
      .select("doc_id", "text_deduped", "segs_kept")
      .as[(Long, String, Long)].collect().toSet
    // sequential reference over (doc_id, seg_idx) order
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = corpus.flatMap { case (id, text) =>
      val kept = text.split(" ").grouped(2).map(_.mkString(" "))
        .filter(seen.add).toSeq
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.size.toLong))
    }.toSet
    assert(got === expected)
    assert(!got.exists(_._1 == 3L)) // fully-duplicate doc vanished
    assert(got.contains((4L, "x y z", 2L)))
  }

  test("segmentDedup keep-set is invariant to input partitioning") {
    val base = docs.select("doc_id", "text")
    val a = NearDup.segmentDedup(base, segWords = 10)
      .as[(Long, String, Long)].collect().toSet
    val b = NearDup.segmentDedup(base.repartition(13), segWords = 10)
      .as[(Long, String, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("boilerplateScrub removes every copy of a repeated segment") {
    // same corpus shape as the segmentDedup test, but here "a b" and
    // "c d"/"e f" are boilerplate (repeated) — ALL copies go,
    // including the first: doc 1 loses everything, doc 2 and 3 each
    // keep only their unique tail/none, doc 4 keeps its unique tail.
    val corpus = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "c d e f"),
      (4L, "a b x y z"))
    val got = NearDup.boilerplateScrub(corpus.toDF("doc_id", "text"), segWords = 2)
      .select("doc_id", "text_clean", "segs_kept")
      .as[(Long, String, Long)].collect().toSet
    // reference: corpus-wide segment counts, keep only count==1
    val counts = corpus.flatMap { case (_, t) =>
      t.split(" ").grouped(2).map(_.mkString(" ")) }
      .groupBy(identity).map { case (s, o) => s -> o.size }
    val expected = corpus.flatMap { case (id, text) =>
      val kept = text.split(" ").grouped(2).map(_.mkString(" "))
        .filter(counts(_) == 1).toSeq
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.size.toLong))
    }.toSet
    assert(got === expected)
    assert(!got.exists(_._1 == 1L) && !got.exists(_._1 == 3L))
    assert(got.contains((4L, "x y z", 2L)))
  }

  test("boilerplateScrub is invariant to input partitioning") {
    val base = docs.select("doc_id", "text")
    val a = NearDup.boilerplateScrub(base, segWords = 10)
      .as[(Long, String, Long)].collect().toSet
    val b = NearDup.boilerplateScrub(base.repartition(13), segWords = 10)
      .as[(Long, String, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("spanScrub equals a sequential first-occurrence reference") {
    // k=3. doc 1 owns all its grams; doc 2 embeds doc 1's "a b c d"
    // mid-text (any alignment — the case segmentDedup's fixed tiling
    // misses) so only its fresh ends survive; doc 3 is a verbatim
    // copy of doc 1 and must vanish; docs 4/5 show a short doc (one
    // gram) kept then scrubbed.
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "a b c d e f"),
      (4L, "p q r"),
      (5L, "p q r"))
    val k = 3
    val got = NearDup.spanScrub(corpus.toDF("doc_id", "text"), k = k)
      .select("doc_id", "text_scrubbed", "kept_tokens")
      .as[(Long, String, Long)].collect().toSet
    // sequential reference over global (doc_id, pos) order
    val seen = scala.collection.mutable.Set.empty[String]
    val covered = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Int]]
    for ((id, text) <- corpus.sortBy(_._1)) {
      val toks = text.split(" ")
      for (p <- 0 to toks.length - k) {
        val gram = toks.slice(p, p + k).mkString(" ")
        if (!seen.add(gram))
          covered.getOrElseUpdate(id, scala.collection.mutable.Set.empty) ++= (p until p + k)
      }
    }
    val expected = corpus.flatMap { case (id, text) =>
      val cov = covered.getOrElse(id, scala.collection.mutable.Set.empty[Int])
      val kept = text.split(" ").zipWithIndex.collect {
        case (t, p) if !cov(p) => t
      }
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.length.toLong))
    }.toSet
    assert(got === expected)
    assert(!got.exists(_._1 == 3L)) // verbatim copy vanished
    assert(got.contains((2L, "x y", 2L)))
    assert(got.contains((4L, "p q r", 3L)) && !got.exists(_._1 == 5L))
  }

  test("scrub family survives a hyper-frequent gram (~20% of the corpus mass)") {
    // the skew case the hash-keyed partial-agg shape exists for: ONE
    // boilerplate sentence opens every 2nd doc of 400, so a single
    // gram/segment key carries ~20% of all occurrences. The raw-text
    // row_number-window formulation funneled all of it into one
    // partition for a per-key sort; the agg form must stay correct
    // (checked against the same sequential references) at any skew.
    val boiler = "all rights reserved by the site operator"
    val corpus = (1L to 400L).map { id =>
      val body = s"unique u${id}a u${id}b u${id}c u${id}d u${id}e u${id}f"
      (id, if (id % 2 == 0) s"$boiler $body" else body)
    }
    val df = corpus.toDF("doc_id", "text").repartition(16)

    // segmentDedup (segWords=4): keep-first over global (doc_id, idx)
    val seen = scala.collection.mutable.Set.empty[String]
    val segExpected = corpus.flatMap { case (id, text) =>
      val kept = text.split(" ").grouped(4).map(_.mkString(" "))
        .filter(seen.add).toSeq
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.size.toLong))
    }.toSet
    val segGot = NearDup.segmentDedup(df, segWords = 4)
      .as[(Long, String, Long)].collect().toSet
    assert(segGot === segExpected)

    // boilerplateScrub (maxFreq=1): every copy of a repeated segment goes
    val counts = corpus.flatMap { case (_, t) =>
      t.split(" ").grouped(4).map(_.mkString(" ")) }
      .groupBy(identity).map { case (s, o) => s -> o.size }
    val boilExpected = corpus.flatMap { case (id, text) =>
      val kept = text.split(" ").grouped(4).map(_.mkString(" "))
        .filter(counts(_) == 1).toSeq
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.size.toLong))
    }.toSet
    val boilGot = NearDup.boilerplateScrub(df, segWords = 4)
      .as[(Long, String, Long)].collect().toSet
    assert(boilGot === boilExpected)

    // spanScrub (k=3): sliding-window keep-first over global (doc_id, pos)
    val k = 3
    val seenG = scala.collection.mutable.Set.empty[String]
    val covered = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Int]]
    for ((id, text) <- corpus.sortBy(_._1)) {
      val toks = text.split(" ")
      for (p <- 0 to toks.length - k) {
        val gram = toks.slice(p, p + k).mkString(" ")
        if (!seenG.add(gram))
          covered.getOrElseUpdate(id,
            scala.collection.mutable.Set.empty) ++= (p until p + k)
      }
    }
    val spanExpected = corpus.flatMap { case (id, text) =>
      val cov = covered.getOrElse(id, scala.collection.mutable.Set.empty[Int])
      val kept = text.split(" ").zipWithIndex.collect {
        case (t, p) if !cov(p) => t }
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.length.toLong))
    }.toSet
    val spanGot = NearDup.spanScrub(df, k = k)
      .as[(Long, String, Long)].collect().toSet
    assert(spanGot === spanExpected)
  }

  test("spanScrub is invariant to input partitioning and scrubs the fixture corpus") {
    val base = docs.select("doc_id", "text")
    val a = NearDup.spanScrub(base, k = 5)
      .as[(Long, String, Long)].collect().toSet
    val b = NearDup.spanScrub(base.repartition(13), k = 5)
      .as[(Long, String, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
    // the fixture corpus has planted near-dups → something must scrub
    val totalToks = docs.select(size(split($"text", " "))).as[Int].collect().sum
    assert(a.toSeq.map(_._3).sum < totalToks)
  }
}
