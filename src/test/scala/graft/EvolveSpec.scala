package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}
import graft.tables.Evolve

/** Schema evolution through the versioned registry: adding a column
  * is one metadata write, old files are never touched, reads fill the
  * registered default on pre-evolution files only.
  */
class EvolveSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("evolve_spec").toString

  private def dataFiles(root: String): Map[String, (Long, Long)] = {
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      f.listStatus(p).toSeq.flatMap {
        case d if d.isDirectory => walk(d.getPath)
        case s => Seq(s)
      }
    walk(new Path(root))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.toString -> (s.getModificationTime, s.getLen))
      .toMap
  }

  test("added column: one metadata write, zero files rewritten, default fills old epochs only") {
    val root = freshRoot()
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "n")
      .write.mode("overwrite").parquet(root)
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    assert(Evolve.currentVersion(spark, root) === 1)
    val before = dataFiles(root)
    Evolve.addColumn(spark, root, StructField("cents", LongType), "0")
    assert(Evolve.currentVersion(spark, root) === 2)
    assert(dataFiles(root) === before, "addColumn touched data files")
    Seq((3L, "c", 30L, 77L)).toDF("id", "k", "n", "cents")
      .write.mode("append").parquet(root)
    val got = Evolve.read(spark, root)
      .select($"id", $"cents").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 0L), (2L, 0L), (3L, 77L)))
  }

  test("two evolutions stack; both defaults apply; duplicate column refused") {
    val root = freshRoot()
    Seq((1L, 5L)).toDF("id", "n").write.mode("overwrite").parquet(root)
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    Evolve.addColumn(spark, root, StructField("cents", LongType), "0")
    Evolve.addColumn(spark, root, StructField("src", StringType), "unknown")
    assert(Evolve.currentVersion(spark, root) === 3)
    val row = Evolve.read(spark, root)
      .select($"id", $"cents", $"src").as[(Long, Long, String)].head()
    assert(row === ((1L, 0L, "unknown")))
    val e = intercept[IllegalArgumentException] {
      Evolve.addColumn(spark, root, StructField("cents", LongType), "1")
    }
    assert(e.getMessage.contains("already exists"))
    // a default that cannot cast to the column type must refuse at
    // evolve time, not silently become NULL at read time
    val bad = intercept[IllegalArgumentException] {
      Evolve.addColumn(spark, root, StructField("n2", LongType), "n/a")
    }
    assert(bad.getMessage.contains("does not cast"))
    // register is idempotent: re-running the init (base schema = v1)
    // never clobbers an evolved registry, and reports it created
    // nothing
    assert(!Evolve.register(spark, root, spark.read.parquet(root).schema))
    assert(Evolve.currentVersion(spark, root) === 3)
  }

  test("register refuses a schema matching no registered version; known versions no-op") {
    val root = freshRoot()
    Seq((1L, 5L)).toDF("id", "n").write.mode("overwrite").parquet(root)
    val base = spark.read.parquet(root).schema
    assert(Evolve.register(spark, root, base), "first register creates v1")
    Evolve.addColumn(spark, root, StructField("cents", LongType), "0")
    val evolved = Evolve.read(spark, root).schema
    // both the original init schema (v1) and the current evolved one
    // (v2) re-register as no-ops
    assert(!Evolve.register(spark, root, base))
    assert(!Evolve.register(spark, root, evolved))
    assert(Evolve.currentVersion(spark, root) === 2)
    // a FOREIGN schema (the typo'd-root case) refuses instead of
    // silently keeping the existing registry
    val foreign = Seq(("x", 1.5)).toDF("name", "score").schema
    val e = intercept[IllegalArgumentException] {
      Evolve.register(spark, root, foreign)
    }
    assert(e.getMessage.contains("matches none"))
    assert(Evolve.currentVersion(spark, root) === 2, "refusal must not write")
  }

  test("a bad default refuses with the curated message under ANSI exception types too") {
    import org.apache.spark.sql.types.{DateType, IntegerType}
    val root = freshRoot()
    Seq((1L, 5L)).toDF("id", "n").write.mode("overwrite").parquet(root)
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    // under ANSI (Spark 4 default) these casts throw
    // SparkDateTimeException / SparkNumberFormatException — different
    // RuntimeException branches; every one must map to the curated
    // "does not cast" refusal, never escape raw (ADVICE r13)
    for ((field, dflt) <- Seq(
        (StructField("d", DateType), "2024-99-99"),
        (StructField("m", IntegerType), "not-a-number"))) {
      val e = intercept[IllegalArgumentException] {
        Evolve.addColumn(spark, root, field, dflt)
      }
      assert(e.getMessage.contains("does not cast"), s"$field: ${e.getMessage}")
    }
    assert(Evolve.currentVersion(spark, root) === 1, "refusals must not version-bump")
  }

  test("register ignores nullability: a parquet read-back schema re-registers as a no-op") {
    val root = freshRoot()
    Seq((1L, 5L)).toDF("id", "n").write.mode("overwrite").parquet(root)
    val base = spark.read.parquet(root).schema
    assert(Evolve.register(spark, root, base))
    // same logical table, opposite nullability flags (the toDF-vs-
    // parquet-read-back drift every re-run init hits)
    val flipped = org.apache.spark.sql.types.StructType(
      base.fields.map(f => f.copy(nullable = !f.nullable)))
    assert(!Evolve.register(spark, root, flipped),
      "nullability drift must not break register idempotency")
    assert(Evolve.currentVersion(spark, root) === 1)
    // a genuinely different column set still refuses
    intercept[IllegalArgumentException] {
      Evolve.register(spark, root,
        Seq((1L, "x")).toDF("id", "name").schema)
    }
  }

  test("conform refuses columns the registry lacks instead of silently dropping them") {
    val root = freshRoot()
    Seq((1L, 5L)).toDF("id", "n").write.mode("overwrite").parquet(root)
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    val ahead = Seq((2L, 6L, 9L)).toDF("id", "n", "score")
    val e = intercept[IllegalArgumentException] {
      Evolve.conform(spark, root, ahead).collect()
    }
    assert(e.getMessage.contains("score") &&
      e.getMessage.contains("addColumn"), e.getMessage)
    // once the registry catches up, the same frame conforms cleanly
    Evolve.addColumn(spark, root, StructField("score", LongType), "-1")
    val ok = Evolve.conform(spark, root, ahead)
      .select($"id", $"score").as[(Long, Long)].head()
    assert(ok === ((2L, 9L)))
  }

  test("read without a registry refuses loudly") {
    val root = freshRoot()
    Seq((1L, 2L)).toDF("a", "b").write.mode("overwrite").parquet(root)
    val e = intercept[IllegalArgumentException] { Evolve.read(spark, root) }
    assert(e.getMessage.contains("no registered schema"))
  }

  test("evolution over a date-partitioned serving layout keeps partition pruning") {
    val root = freshRoot()
    val ev = Tables.events(spark, sfDir)
    val r = ev.agg(min(to_date($"ts")), max(to_date($"ts"))).head()
    val (lo, hi) = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
    val mid = lo.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2).toString
    val epoch1 = ev.filter(to_date($"ts") < lit(mid))
      .select($"event_id", $"ts", $"user_id", $"event_type")
    graft.tables.TableManager.writePartitioned(
      epoch1, root, "ts", Seq("event_type", "ts"))
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    Evolve.addColumn(spark, root, StructField("value_cents", LongType), "-1")
    val epoch2 = ev.filter(to_date($"ts") >= lit(mid))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value_cents")
    graft.tables.TableManager.writePartitioned(
      epoch2, root, "ts", Seq("event_type", "ts"),
      mode = org.apache.spark.sql.SaveMode.Append)
    val evolved = Evolve.read(spark, root)
    // old epoch answers with the default, new with real values
    assert(evolved.filter($"p_date" < lit(mid))
      .filter($"value_cents" =!= -1L).count() === 0L)
    assert(evolved.filter($"p_date" >= lit(mid))
      .filter($"value_cents" === -1L).count() === 0L)
    assert(evolved.count() === ev.count())
    // partition pruning survives the explicit-schema read: the
    // date-bounded scan opens strictly fewer files than the table has
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val pruned = evolved.filter($"p_date" >= lit(mid))
    pruned.collect()
    val prunedFiles = scans(pruned.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val totalFiles = dataFiles(root).size
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"expected a pruned read: $prunedFiles of $totalFiles files")
  }

  test("widenColumn: INT→LONG is one metadata write; old files upcast exactly; narrow producers still conform") {
    val root = freshRoot()
    Seq((1L, 100), (2L, 200)).toDF("id", "cents") // cents is INT here
      .write.mode("overwrite").parquet(root)
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    val before = dataFiles(root)
    Evolve.widenColumn(spark, root, "cents", LongType)
    assert(Evolve.currentVersion(spark, root) === 2)
    assert(dataFiles(root) === before, "widenColumn touched data files")
    // post-widening epoch carries values only LONG can hold
    Seq((3L, 3000000000L)).toDF("id", "cents")
      .write.mode("append").parquet(root)
    val evolved = Evolve.read(spark, root)
    assert(evolved.schema("cents").dataType === LongType)
    assert(evolved.select($"id", $"cents").as[(Long, Long)].collect().toSet
      === Set((1L, 100L), (2L, 200L), (3L, 3000000000L)),
      "narrow-epoch values did not upcast exactly")
    // a pre-widening producer's frame (still INT) conforms losslessly
    val conformed = Evolve.conform(spark, root, Seq((4L, 7)).toDF("id", "cents"))
    assert(conformed.schema("cents").dataType === LongType)
    assert(conformed.select($"cents").as[Long].head() === 7L)
    // narrowings and cross-kind changes refuse — they rewrite data,
    // which is a different operation
    intercept[IllegalArgumentException] {
      Evolve.widenColumn(spark, root, "cents",
        org.apache.spark.sql.types.IntegerType)
    }
    intercept[IllegalArgumentException] {
      Evolve.widenColumn(spark, root, "cents", StringType)
    }
    intercept[IllegalArgumentException] {
      Evolve.widenColumn(spark, root, "missing", LongType)
    }
  }

  test("conform refuses type drift loudly instead of corrupting values into defaults") {
    val root = freshRoot()
    Seq((1L, 10L)).toDF("id", "n").write.mode("overwrite").parquet(root)
    Evolve.register(spark, root, spark.read.parquet(root).schema)
    Evolve.addColumn(spark, root, StructField("score", LongType), "-1")
    // producer changed n from long to string: a silent cast would
    // null every value and the default would then paper over it
    val drifted = Seq(("2", "oops", 5L)).toDF("id", "n", "score")
      .select($"id".cast("long").as("id"), $"n", $"score")
    val e = intercept[Evolve.SchemaDriftException] {
      Evolve.conform(spark, root, drifted)
    }
    assert(e.getMessage.contains("arrives as string"), e.getMessage)
    // and the widening direction still conforms (not drift): an INT
    // frame against a LONG registry upcasts
    val ok = Evolve.conform(spark, root,
      Seq((3, 30L, 9L)).toDF("id", "n", "score")
        .select($"id", $"n", $"score"))
    assert(ok.select($"id").as[Long].head() === 3L)
  }
}
