package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomExprs
import graft.ops.BloomJoin

/** Bloom-pruned semi join: exactness (≡ plain semi join), the
  * no-false-negative bloom property, actual pruning on a selective
  * build side, and codegen/interpreted agreement of the probe
  * expression.
  */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private def fact = Tables.lineitem(spark, sfDir)
  private def dim =
    Tables.orders(spark, sfDir).filter(col("o_totalprice") > 450000)

  test("bloom semi join ≡ plain left_semi join") {
    val bloomed = BloomJoin
      .semiJoin(fact, dim, "l_orderkey", "o_orderkey", expectedItems = 10000L)
      .select($"l_orderkey", $"l_linenumber").collect().toSet
    val plain = fact
      .join(dim.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber").collect().toSet
    assert(bloomed === plain)
    assert(plain.nonEmpty)
  }

  test("no false negatives: every build-side key passes the probe") {
    val sketch = BloomJoin.buildSketch(dim, "o_orderkey", 10000L, 0.01)
    val n = dim.count()
    val pass = dim
      .filter(BloomExprs.might_contain_long($"o_orderkey", sketch)).count()
    assert(pass === n)
  }

  test("the probe actually prunes a selective fact scan") {
    val sketch = BloomJoin.buildSketch(dim, "o_orderkey", 10000L, 0.01)
    val total = fact.count()
    val trueMatches = fact
      .join(dim.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_semi")
      .count()
    val pruned = fact
      .filter(BloomExprs.might_contain_long($"l_orderkey", sketch)).count()
    // superset of true matches, but way below the full scan: the
    // sketch removes most non-matching rows before any exchange
    assert(pruned >= trueMatches)
    assert(pruned < total,
      s"bloom kept all $total rows — no pruning happened")
    assert(pruned - trueMatches <= (total * 0.05).toLong,
      s"false-positive volume ${pruned - trueMatches} exceeds 5% of $total (fpp=0.01)")
  }

  test("probe agrees between codegen and interpreted eval") {
    val sketch = BloomJoin.buildSketch(dim, "o_orderkey", 10000L, 0.01)
    val keys = fact.select($"l_orderkey").limit(500)
    val withCodegen = keys
      .filter(BloomExprs.might_contain_long($"l_orderkey", sketch))
      .collect().map(_.getLong(0)).sorted.toSeq
    val interpreted = spark.sessionState.conf
    val prev = interpreted.getConfString("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCodegen = keys
        .filter(BloomExprs.might_contain_long($"l_orderkey", sketch))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(withCodegen === noCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("same-named keys on both sides don't hit ambiguous references") {
    val factR = fact.withColumnRenamed("l_orderkey", "order_key")
    val dimR = dim.select($"o_orderkey".as("order_key"))
    val n = BloomJoin
      .semiJoin(factR, dimR, "order_key", "order_key", expectedItems = 10000L)
      .count()
    val plain = factR.join(dimR.distinct(),
      factR("order_key") === dimR("order_key"), "left_semi").count()
    assert(n === plain)
    assert(n > 0)
  }

  test("bloom-prefiltered decontamination ≡ exact decontamination, probe below the join") {
    val d = Tables.documents(spark, sfDir)
    val cand = d.filter($"doc_id" >= 10)
    val bench = d.filter($"doc_id" < 10)
    val exact = graft.ops.NearDup.contaminationOverlap(cand, bench, n = 3)
      .as[(Long, Long)].collect().toSet
    val bloomDf = graft.ops.NearDup.contaminationOverlapBloom(cand, bench, n = 3)
    assert(bloomDf.as[(Long, Long)].collect().toSet === exact)
    assert(exact.nonEmpty)
    // the probe must prune the candidate postings BELOW (deeper than)
    // the exact join — i.e. before any exchange of candidate shingles
    val p = bloomDf.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    val probeIdx = finalPlan.toLowerCase.indexOf("bloommightcontainlong")
    val joinIdx = finalPlan.indexOf("Join")
    assert(probeIdx >= 0, "probe expression missing\n" + p)
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe not below the join (join@$joinIdx, probe@$probeIdx)\n" + p)
  }

  test("null keys yield null (filtered out), not a crash") {
    val sketch = BloomJoin.buildSketch(dim, "o_orderkey", 10000L, 0.01)
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
    val kept = df.filter(BloomExprs.might_contain_long($"k", sketch)).count()
    assert(kept <= 2) // the null row can never pass a null-strict predicate
  }
}
