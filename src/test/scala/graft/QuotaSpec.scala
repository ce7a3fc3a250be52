package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Quota

/** Token-budget mixture allocation ([[graft.ops.Quota]]): the keyed
  * distributed exclusive scan against the sequential definition, the
  * quota mass bounds, epoch-cap clamping, and absent-source handling.
  */
class QuotaSpec extends SparkSuite {
  import spark.implicits._

  private def docsWithTokens = Tables.documents(spark, sfDir).select(
    col("doc_id"), col("source"),
    graft.functions.Text.tokenCount(col("text")).as("n_tokens"),
    md5(concat(lit("quota1:"), col("doc_id").cast("string"))).as("_ord"))

  test("keyedExclusiveScan equals the sequential per-key cumsum") {
    val d = docsWithTokens
    // few partitions relative to keys, so keys straddle partitions
    for (nParts <- Seq(1, 3, 16)) {
      val got = Quota.keyedExclusiveScan(d, "source", Seq("_ord"), "doc_id",
          "n_tokens", partitions = nParts)
        .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
      val w = Window.partitionBy($"source").orderBy($"_ord", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = d.withColumn("cum", coalesce(sum($"n_tokens").over(w), lit(0L)))
        .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
      assert(got === want, s"scan parity failed at partitions=$nParts")
    }
  }

  test("keyedExclusiveScan rejects a null key with a named error, not an opaque NPE") {
    val d = Seq((1L, "a", 10L, 1L), (2L, null.asInstanceOf[String], 5L, 2L))
      .toDF("doc_id", "source", "n_tokens", "_ord")
    val e = intercept[IllegalArgumentException] {
      Quota.keyedExclusiveScan(d, "source", Seq("_ord"), "doc_id",
        "n_tokens", partitions = 2).collect()
    }
    assert(e.getMessage.contains("null value in key column 'source'"))
  }

  test("tokenBudget: uncapped selected mass lands in [budget, budget + straddler)") {
    val d = docsWithTokens.drop("_ord")
    val totals = d.groupBy($"source").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    // mixed quotas: sub-epoch, exact multiples, and multi-epoch
    val budgets = totals.zipWithIndex.map { case ((s, t), i) =>
      s -> t * (i % 5) / 2
    }.toMap
    val out = Quota.tokenBudget(d, "doc_id", "source", "n_tokens",
      budgets, maxEpochs = 100)
    val mass = out.groupBy($"source")
      .agg(sum($"n_tokens" * $"n_epochs").as("m"), max($"n_tokens").as("mx"))
      .as[(String, Long, Long)].collect()
    val covered = mass.map(_._1).toSet
    for ((s, m, mx) <- mass) {
      val b = budgets(s)
      assert(m >= b && m < b + mx, s"source $s: mass $m outside [$b, $b+$mx)")
    }
    // zero-quota sources contribute nothing; positive ones all appear
    for ((s, b) <- budgets)
      assert(covered.contains(s) === (b > 0), s"source $s coverage vs budget $b")
  }

  test("tokenBudget: the cap clamps counts but never changes membership") {
    val d = docsWithTokens.drop("_ord")
    val totals = d.groupBy($"source").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val budgets = totals.map { case (s, t) => s -> t * 5 / 2 }
    val free = Quota.tokenBudget(d, "doc_id", "source", "n_tokens",
        budgets, maxEpochs = 100)
      .select($"doc_id", $"n_epochs").as[(Long, Long)].collect().toMap
    val capped = Quota.tokenBudget(d, "doc_id", "source", "n_tokens",
        budgets, maxEpochs = 2)
      .select($"doc_id", $"n_epochs").as[(Long, Long)].collect().toMap
    assert(free.keySet === capped.keySet)
    assert(free.values.max === 3L) // 2.5 epochs => straddlers get 3
    assert(capped.values.max === 2L)
    assert(capped === free.map { case (k, v) => k -> math.min(v, 2L) })
  }

  test("strideInterleave: seq is a permutation and matches the window definition") {
    val d = docsWithTokens.drop("_ord")
    val totals = d.groupBy($"source").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val budgets = totals.map { case (s, t) => s -> t * 3 / 2 }
    val alloc = Quota.tokenBudget(d, "doc_id", "source", "n_tokens",
      budgets, maxEpochs = 3)
    val got = Quota.strideInterleave(alloc)
      .select($"seq", $"doc_id", $"epoch").as[(Long, Long, Long)]
      .collect().map(r => (r._2, r._3) -> r._1).toMap
    // sequential definition: per-source row_number -> stride position
    // -> one global window
    val ex = alloc.withColumn("epoch", explode(sequence(lit(0L), $"n_epochs" - 1)))
      .withColumn("_ord", md5(concat(lit("quota1:"), $"doc_id".cast("string"))))
    val wSrc = Window.partitionBy($"source").orderBy($"epoch", $"_ord", $"doc_id")
    val want = ex
      .withColumn("r", row_number().over(wSrc).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("pos", ($"r" * 2 + 1).cast("double") / ($"n" * 2).cast("double"))
      .withColumn("seq", row_number().over(
        Window.orderBy($"pos", $"source", $"doc_id", $"epoch")).cast("long"))
      .select($"seq", $"doc_id", $"epoch").as[(Long, Long, Long)]
      .collect().map(r => (r._2, r._3) -> r._1).toMap
    assert(got === want)
    assert(got.values.toSeq.sorted === (1L to got.size.toLong))
  }

  test("vocab coverage matches the sequential window definition; sizes monotone") {
    val got = graft.queries.DocQueries.docVocabCoverage(spark, sfDir)
      .as[(Long, Long)].collect().sortBy(_._1)
    // sequential definition: one global window cumsum + min rank
    val w = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val sorted = w.sortBy { case (word, c) => (-c, word) }
    val total = sorted.map(_._2).sum
    val cums = sorted.scanLeft(0L)(_ + _._2).drop(1)
    val want = Seq(500L, 900L, 990L).map { t =>
      t -> (cums.indexWhere(_ * 1000 >= t * total) + 1).toLong
    }
    assert(got.toSeq === want)
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
  }

  test("tokenBudget: sources absent from the budget map are excluded") {
    val d = docsWithTokens.drop("_ord")
    val one = d.select($"source").distinct().as[String].collect().sorted.head
    val out = Quota.tokenBudget(d, "doc_id", "source", "n_tokens",
      Map(one -> 1000000L), maxEpochs = 100)
    assert(out.select($"source").distinct().as[String].collect().toSeq === Seq(one))
  }
}
