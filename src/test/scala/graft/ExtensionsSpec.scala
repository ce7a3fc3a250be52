package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VecExprs

/** The SparkSessionExtensions pathway: the optimizer rule rewrites
  * HOF dot products to the codegen'd kernel (same results), and the
  * injected SQL function resolves for pure-SQL clients.
  */
class ExtensionsSpec extends SparkSuite {

  /** A second session on the shared context, WITH extensions. */
  private lazy val ext: SparkSession = {
    val shared = spark // force the shared session FIRST, or its lazy
    // init would getOrCreate and alias to the extended one
    assert(shared ne null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    // restore the shared session as default so later suites are
    // unaffected by this one
    SparkSession.setDefaultSession(spark)
    SparkSession.setActiveSession(spark)
    s
  }

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  test("optimizer rule rewrites the HOF pattern to VecDot") {
    import ext.implicits._
    // repartition keeps the local relation from being constant-folded
    // away before the plan can be inspected
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5), Array(2.0, 4.0))
    ).toDF("a", "b").repartition(1).select(hofDot($"a", $"b").as("d"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("vecdot"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(32.0, -5.0))
  }

  test("rewrite preserves results vs the un-extended session, incl. float arrays") {
    import ext.implicits._
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(9.0f, 8.0f, 7.0f)))
    val extRes = rows.toDF("a", "b")
      .select(hofDot($"a", $"b").as("d")).collect().map(_.getDouble(0)).toSeq
    val plain = {
      import spark.implicits._
      rows.toDF("a", "b")
        .select(hofDot($"a", $"b").as("d")).collect().map(_.getDouble(0)).toSeq
    }
    val kernel = {
      import spark.implicits._
      rows.toDF("a", "b")
        .select(VecExprs.vec_dot($"a", $"b").as("d")).collect().map(_.getDouble(0)).toSeq
    }
    assert(extRes === plain)
    assert(extRes === kernel)
  }

  test("raw-float multiply (no double casts) is NOT rewritten — per-product rounding differs") {
    import ext.implicits._
    // (x, y) => x * y over float arrays types the product as FLOAT;
    // VecDot widens before multiplying, so rewriting would change
    // results — the rule must skip this spelling
    val df = Seq((Array(0.3f), Array(0.3f))).toDF("a", "b")
      .repartition(1)
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("vecdot"),
      df.queryExecution.optimizedPlan.toString)
    val plain = {
      import spark.implicits._
      Seq((Array(0.3f), Array(0.3f))).toDF("a", "b")
        .select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0d), (acc, x) => acc + x).as("d"))
        .collect().head.getDouble(0)
    }
    assert(df.collect().head.getDouble(0) === plain)
  }

  test("mixed-type HOF is left untouched") {
    import ext.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0)))
      .toDF("a", "b").select(hofDot($"a", $"b").as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("vecdot"))
    assert(df.collect().head.getDouble(0) === 11.0)
  }

  test("injected SQL function vec_dot resolves for pure-SQL clients") {
    val r = ext.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
    // the un-extended session must NOT have it (proves injection, not
    // a global registry side effect)
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0d), array(1.0d))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot"))
  }

  test("injected text family: SQL spelling equals the Column API, isolated to its session") {
    // withExtensions path
    val r = ext.sql(
      "SELECT graft_normalize(' Hello,  World! ') AS n, graft_token_count('a b c') AS c, " +
        "graft_lang_id('the the a data') AS l, graft_hash_bucket(42, 100) AS b").collect().head
    assert(r.getString(0) === "hello world")
    assert(r.getLong(1) === 3L)
    assert(r.getString(2) === "en")
    // same value the Column API computes
    import ext.implicits._
    val apiBucket = Seq(42L).toDF("id")
      .select(graft.functions.Text.hashBucket($"id", 100)).collect().head.getLong(0)
    assert(r.getLong(3) === apiBucket)
    // the un-extended shared session must NOT see the family...
    val err = intercept[Exception] {
      spark.sql("SELECT graft_normalize('x')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_normalize"))
    // ...until the post-hoc registration path (the gate's) adds it
    graft.plans.GraftExtensions.registerTextFunctions(spark)
    assert(spark.sql("SELECT graft_token_count('x y') AS c").collect().head.getLong(0) === 2L)
  }

  test("injected sketch kernels: SQL log-bucket/edge equal the Column API and honor the bound") {
    import ext.implicits._
    val vs = (0L to 100000L).toDF("v")
    vs.createOrReplaceTempView("ext_vals")
    val viaSql = ext.sql(
      "SELECT v, graft_log_bucket(v) AS b, graft_log_edge(graft_log_bucket(v)) AS e FROM ext_vals")
      .as[(Long, Long, Long)].collect()
    val viaCols = vs.select(col("v"),
        graft.serving.Serving.logBucket(col("v")).as("b"))
      .withColumn("e", graft.serving.Serving.logBucketEdge(col("b")))
      .as[(Long, Long, Long)].collect()
    assert(viaSql.sortBy(_._1).toSeq === viaCols.sortBy(_._1).toSeq)
    viaSql.foreach { case (v, _, e) =>
      assert(e <= v)
      if (v >= 16) assert((v - e) * 16 <= v, s"v=$v e=$e")
    }
  }

  test("q_embed_dot_sql installs the rule post-hoc and matches brute-force ranks") {
    // the gate entry's pathway: extraOptimizations on a session built
    // WITHOUT extensions (as the driver builds it) — its own require
    // asserts the rewrite fired; here also pin result correctness
    val df = graft.queries.EmbedQueries.dotTopKSql(spark, "/root/testdata/sf0.001")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 20 && got.map(_._1).toSeq === (1L to 20L))
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val anchor = emb.filter($"vec_id" === 0).select($"embedding".as("av"))
    val expected = emb.filter($"vec_id" =!= 0).crossJoin(anchor)
      .select($"vec_id", VecExprs.vec_dot($"embedding", $"av").as("dot"))
      .orderBy($"dot".desc, $"vec_id").limit(20)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got.map(_._2).toSeq === expected)
  }
}
