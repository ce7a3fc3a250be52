package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-slope measurement over the heaviest batch families — the
  * measurement half of the scale-cliff stress harness (data half:
  * [[ScaleFixture]]). Runs a fixed pick of the most expensive
  * scale-SENSITIVE gates (iterative dedup/star-contraction, LSH
  * banding, tokenizer training, census joins, graph iteration,
  * retrieval index build+query, embedding dedup) once warm at the
  * given fixture dir and prints one JSON line of seconds per gate.
  * Run at sf0.1 and at the ~10× fixture; the per-family ratio vs the
  * data ratio is the s/sf slope SURVEY §6 records — anything
  * scaling clearly worse than ~linear×log is a scale cliff the
  * 17 MB fixtures could never show.
  *
  * Streaming gates are excluded on purpose: their wall time is
  * micro-batch/checkpoint harness, which does not scale with data
  * and would dilute the slope signal.
  *
  *   sbt "runMain graft.tools.ScaleBench target/sf1x"
  */
object ScaleBench {

  /** Scale-sensitive picks, heaviest families first. */
  val picks: Seq[String] = Seq(
    "q_doc_curate",          // filter -> md5 dedup -> star contraction
    "q_doc_dedup_best",      // star contraction, BEST survivor
    "q_doc_dedup_canonical", // star contraction, min-id
    "q_doc_dedup_jaccard",   // n-gram Jaccard + prefix/length filters
    "q_doc_dedup_minhash",   // MinHash+LSH banding
    "q_doc_cluster_sizes",   // cluster-size audit over the dup graph
    "q_doc_dup_ngrams",      // dup n-gram census
    "q_doc_lm_score",        // salted census probe join
    "q_doc_unigram_trained", // unigram-LM EM training
    "q_doc_bpe_trained",     // BPE training rounds
    "q_doc_search_hybrid",   // inverted+ANN index build + RRF fusion
    "q_embed_dedup_canonical", // cosine pairs -> star contraction
    "q_embed_semantic_dedup",  // in-cell pair scan
    "q_embed_knn",             // brute-force KNN baseline
    "q_type_pagerank",         // exact integer graph iteration
    "q_sessionize",            // session windows over events
    "q_hour_profile"           // plain windowed agg (linear control)
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = graft.SparkEntry.queries
    val missing = picks.filterNot(qs.contains)
    require(missing.isEmpty, s"unknown gates: ${missing.mkString(",")}")
    val rows = graft.Tables.events(spark, sfDir).count()
    // warm pass (JIT/codegen/footers + lazy index roots), then timed
    picks.foreach(n => qs(n)(spark, sfDir).count())
    val timed = picks.map { n =>
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).count()
      n -> (System.nanoTime() - t0) / 1e9
    }
    val detail = timed.map { case (n, s) =>
      "\"" + n + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))
    }.mkString("{", ",", "}")
    val stream =
      if (!args.contains("stream")) ""
      else {
        // paired runs: the raw accumulation hazard, then the scheduled
        // compaction tick that is the designed mitigation
        val (early, late) = streamingSlope(spark)
        val (earlyT, lateT) = streamingSlope(spark, compactEvery = 10)
        String.format(java.util.Locale.ROOT,
          ""","stream_ev_s_early":%.0f,"stream_ev_s_late":%.0f""" +
            ""","stream_ev_s_early_ticked":%.0f,"stream_ev_s_late_ticked":%.0f""",
          Double.box(early), Double.box(late),
          Double.box(earlyT), Double.box(lateT))
      }
    println(s"""{"metric":"scale","sf":"$sfDir","event_rows":$rows,"queries":$detail$stream}""")
    spark.stop()
  }

  /** The STREAMING half of the scale question: not "how fast is one
    * run" (Bench measures that) but "does throughput hold as the
    * pipeline's accumulated state grows 10×" — a state leak
    * (unbounded dedup set, never-evicted top-K keys, snowballing
    * checkpoint) shows up as late-window ev/s sagging below the
    * early window, which the bench's short 100k-event run can't see.
    * Runs the full pipeline (dedup → raw + rollup + ranked top-K
    * sinks) for `batches`×`perBatch` events (default 1M = 10× the
    * bench leg) and returns (ev/s over the first 5 batches, ev/s
    * over the last 5).
    */
  def streamingSlope(spark: SparkSession, batches: Int = 50,
      perBatch: Int = 20000, compactEvery: Int = 0): (Double, Double) = {
    import spark.implicits._
    import graft.streaming.{Generator, StreamingPipeline}
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.BenchTick]
    val qsS = StreamingPipeline.start(spark,
      Generator.eventsFromCounter(mem.toDF()),
      s"$dir/raw", s"$dir/rollup", s"$dir/topk", s"$dir/ckpt", k = 5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    try {
      val perBatchSecs = (0 until batches).map { b =>
        // the compaction tick is INSIDE the timed window: the ticked
        // ev/s numbers must charge the mitigation its own cost, or the
        // slope comparison flatters it (ADVICE r13) — a tick that cost
        // more than the sag it removes should show up as a sag
        val t0 = System.nanoTime()
        if (compactEvery > 0 && b > 0 && b % compactEvery == 0)
          StreamingPipeline.compactRollupState(spark, s"$dir/rollup")
        mem.addData((0 until perBatch).map { i =>
          val v = b.toLong * perBatch + i
          graft.BenchTick(new java.sql.Timestamp(base + v * 10), v)
        })
        qsS.foreach(_.processAllAvailable())
        (System.nanoTime() - t0) / 1e9
      }
      def evs(window: Seq[Double]) = window.size.toLong * perBatch / window.sum
      (evs(perBatchSecs.take(5)), evs(perBatchSecs.takeRight(5)))
    } finally qsS.foreach(_.stop())
  }
}
