package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => PropTest}
import graft.ops.{Dedup, Rollup, TopK}

/** Core operator invariants: dedup idempotence, rollup conservation,
  * top-K ⊆ sorted prefix.
  */
class OpsSpec extends SparkSuite {
  import spark.implicits._

  /** Run a ScalaCheck property (few cases — each spins Spark jobs). */
  private def check(p: Prop): Unit = {
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("firstWins dedup is idempotent and keeps the earliest row") {
    val df = Seq(
      ("e1", 10L, "a"), ("e1", 5L, "b"), ("e2", 7L, "c"), ("e1", 99L, "d")
    ).toDF("event_id", "ts", "payload")
    val once = Dedup.firstWins(df, Seq("event_id"), Seq(col("ts").asc))
    val twice = Dedup.firstWins(once, Seq("event_id"), Seq(col("ts").asc))
    assert(once.collect().sortBy(_.getString(0)).map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("e1", 5L), ("e2", 7L)))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("lastWins keeps the latest row per key (Pinot upsert semantics)") {
    val df = Seq(
      ("e1", 10L, "a"), ("e1", 5L, "b"), ("e2", 7L, "c"), ("e1", 10L, "0ties")
    ).toDF("event_id", "ts", "payload")
    val out = Dedup.lastWins(df, Seq("event_id"), "ts", Seq(col("payload").asc))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // e1: latest ts=10 wins, tie broken by payload asc → "0ties"
    assert(out.toSeq === Seq(("e1", 10L, "0ties"), ("e2", 7L, "c")))
  }

  test("partialUpsert merges each column from its latest-setting row") {
    // key k1: three patches — t=1 sets (x=10, y=NULL), t=2 sets
    // (x=NULL, y=7), t=3 sets (x=NULL, y=NULL): merged row must take
    // x from t=1 and y from t=2 (different source rows), never lose a
    // field to a later row that left it null. k2 never sets y → NULL.
    val df = Seq(
      ("k1", 1L, Some(10L), None: Option[Long]),
      ("k1", 2L, None: Option[Long], Some(7L)),
      ("k1", 3L, None: Option[Long], None: Option[Long]),
      ("k2", 1L, Some(5L), None: Option[Long])
    ).toDF("k", "t", "x", "y")
    def run(parts: Int) =
      Dedup.partialUpsert(df.repartition(parts), "k", col("t"),
          Seq("x" -> col("x"), "y" -> col("y"), "last_t" -> col("t")))
        .collect()
        .map(r => (r.getString(0), r.getAs[Any]("x"), r.getAs[Any]("y"),
          r.getLong(3)))
        .sortBy(_._1).toSeq
    val expected = Seq(("k1", 10L, 7L, 3L), ("k2", 5L, null, 1L))
    assert(run(1) === expected)
    assert(run(7) === expected) // merge-tree invariant
  }

  test("dedup of (events ++ duplicates) equals dedup of events") {
    val ev = Tables.events(spark, sfDir)
    val dupes = ev.limit(100)
    val a = Dedup.firstWins(ev, Seq("event_id"), Seq(col("ts").asc, col("user_id").asc))
    val b = Dedup.firstWins(ev.unionAll(dupes), Seq("event_id"), Seq(col("ts").asc, col("user_id").asc))
    assert(a.count() === b.count())
    assert(a.agg(sum("value_cents")).head.getLong(0) === b.agg(sum("value_cents")).head.getLong(0))
  }

  test("rollup conserves totals (sum of window sums = global sum)") {
    val ev = Tables.events(spark, sfDir)
    val r = Rollup.rollup1m(ev)
    assert(r.agg(sum("order_count")).head.getLong(0) === ev.count())
    assert(r.agg(sum("sum_value_cents")).head.getLong(0)
      === ev.agg(sum("value_cents")).head.getLong(0))
  }

  test("hourly compaction conserves the 1-minute rollup") {
    val r = Rollup.rollup1m(Tables.events(spark, sfDir))
    val c = Rollup.compactHourly(r)
    assert(c.agg(sum("order_count")).head.getLong(0)
      === r.agg(sum("order_count")).head.getLong(0))
    assert(c.count() <= r.count())
  }

  test("topKGlobal = prefix of the full sort (property)") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 20), Gen.choose(0L, 1000L)))
    check(Prop.forAll(gen) { xs =>
      val df = xs.toDF("k", "v")
      val agg = df.groupBy($"k").agg(sum($"v").as("total"))
      val k = 5
      val top = TopK.topKGlobal(agg, Seq($"total".desc, $"k".asc), k)
        .select("k", "total").as[(Int, Long)].collect().toSeq
      val full = agg.orderBy($"total".desc, $"k".asc)
        .select("k", "total").as[(Int, Long)].collect().toSeq
      top == full.take(k)
    })
  }

  test("topKPerKey ranks within each key with deterministic tie-break") {
    val df = Seq(
      ("g1", "a", 10L), ("g1", "b", 10L), ("g1", "c", 5L),
      ("g2", "x", 1L)).toDF("g", "item", "n")
    val top = TopK.topKPerKey(df, Seq("g"), Seq($"n".desc, $"item".asc), 2)
      .select("g", "rank", "item").as[(String, Int, String)].collect().toSet
    assert(top === Set(("g1", 1, "a"), ("g1", 2, "b"), ("g2", 1, "x")))
  }

  test("HLL rollup estimate within 5% of exact") {
    val exact = Rollup.rollup1m(Tables.events(spark, sfDir))
      .agg(sum("unique_users")).head.getLong(0)
    val est = Rollup.rollup1mHll(Tables.events(spark, sfDir))
      .agg(sum("unique_users_est")).head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"hll=$est exact=$exact")
  }

  test("segment compaction: one row per window, all query results preserved (incl. HLL)") {
    val ev = Tables.events(spark, sfDir)
    // simulate the streaming pipeline's per-batch segments: split the
    // corpus in two, roll up each half separately, append
    val cutoff = ev.selectExpr("percentile(unix_millis(ts), 0.5)").head.getDouble(0).toLong
    val seg1 = Rollup.rollup1mHll(ev.filter(unix_millis(col("ts")) <= cutoff))
    val seg2 = Rollup.rollup1mHll(ev.filter(unix_millis(col("ts")) > cutoff))
    val segments = seg1.unionByName(seg2)
    val compacted = Rollup.compactSegments(segments)
    val direct = Rollup.rollup1mHll(ev)
    // one row per (window, dims) after compaction
    assert(compacted.count() === direct.count())
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"window_start_ms", $"event_type", $"hour_of_day", $"day_of_week_iso",
        $"order_count", $"sum_value_cents", $"unique_users_est".cast("long"))
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(key(compacted) === key(direct),
      "compacting segments must not change any query-time result")
  }

  test("hourly HLL compaction merges sketches losslessly (= direct hourly sketch)") {
    val ev = Tables.events(spark, sfDir)
    val merged = Rollup.compactHourlyHll(Rollup.rollup1mHll(ev))
      .select($"hour_start_ms", $"event_type", $"unique_users_est".cast("long"))
      .as[(Long, String, Long)].collect().toMap2
    val direct = ev
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id".cast("string"))).cast("long").as("est"))
      .select(unix_millis($"w.start"), $"event_type", $"est")
      .as[(Long, String, Long)].collect().toMap2
    assert(merged === direct)
  }

  test("query-time HLL re-agg over rollup within 5% of exact distinct") {
    val ev = Tables.events(spark, sfDir)
    val est = Rollup.distinctOverRollupHll(Rollup.rollup1mHll(ev), Seq("event_type"))
      .select($"event_type", $"unique_users_est".cast("long"))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05, s"$k hll=${est(k)} exact=$n")
    }
  }

  test("pack offsets: distributed exclusive scan is partition-count invariant") {
    import graft.ops.Pack
    val docs = (1L to 200L).map(i => (i, (i % 37) + 1)).toDF("doc_id", "n_tokens")
    // sequential definition
    val expected = (1L to 200L).scanLeft(0L)((acc, i) => acc + (i % 37) + 1).init
      .zip(1L to 200L).map { case (off, id) => (id, off, off / 64) }.toSet
    for (parts <- Seq(1, 3, 16)) {
      val got = Pack.packOffsets(docs, "doc_id", "n_tokens", budget = 64L, partitions = parts)
        .select($"doc_id", $"start_offset", $"chunk")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected, s"partitions=$parts diverged from the sequential scan")
    }
  }

  test("sparse retrieval matches a BigInt brute force; bounded rank, no self-match") {
    val docs = Tables.documents(spark, sfDir)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val df = graft.ops.SparseSearch.rankedRetrieval(docs, qids, k = 10)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.forall { case (q, d, _) => q != d })
    // brute force: same integer idf/score math over collected tokens
    val toks = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = toks.length.toLong
    val tf: Map[(Long, String), Long] = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => ((id, t), g.length.toLong) }
    }.toMap
    val dfreq: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, ks) => (t, ks.size.toLong) }
    val idf: Map[String, Long] = dfreq.map { case (t, d) => (t, n * 10000L / d) }
    val expected = qids.flatMap { q =>
      val qTerms = tf.collect { case ((id, t), c) if id == q => (t, c) }
      val scores = toks.collect { case (d, _) if d != q =>
        val s = qTerms.map { case (t, qtf) =>
          BigInt(qtf) * BigInt(tf.getOrElse((d, t): (Long, String), 0L)) * BigInt(idf(t))
        }.sum
        (d, s)
      }.filter(_._2 > 0)
      scores.toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
        .zipWithIndex.map { case ((d, _), i) => (q, d, (i + 1).toLong) }
    }.toSet
    assert(out === expected)
    // per-query rank state stays bounded; the query side broadcasts
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("salted join equals the plain join on skewed data") {
    import graft.ops.SkewJoin
    // one hot key (90% of rows) + a long tail
    val big = (1 to 2000).map(i => (if (i % 10 != 0) 1L else i.toLong, i.toLong))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (999L, "absent-key-ok"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), salts = 8)
      .select("k", "v", "name")
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(salted === plain)
    assert(plain.size === 1802) // 1800 hot + k=10 + k=20
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(t => ((t._1, t._2), t._3)).toMap
  }
}
