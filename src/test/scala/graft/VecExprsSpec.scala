package graft

import org.apache.spark.sql.functions._
import graft.functions.{Vectors, VecExprs}

/** The codegen'd VecDot kernel vs its interpreted HOF twin
  * (`aggregate(zip_with(...))`): bit-identical results on float and
  * double arrays, NULL on null elements / mismatched lengths, and
  * correct behavior under both codegen and interpreted eval paths.
  */
class VecExprsSpec extends SparkSuite {
  import spark.implicits._

  /** Interpreted twin: same left-to-right double accumulation. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  test("vec_dot on float arrays == interpreted HOF twin, bit-identical") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-1.5f, 2.5f, 0.0f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val rows = df.select(
      VecExprs.vec_dot($"a", $"b").as("kernel"),
      hofDot($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot on double arrays == interpreted HOF twin") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(1e-300, 1e300), Array(1e300, 1e-300))
    ).toDF("a", "b")
    val rows = df.select(
      VecExprs.vec_dot($"a", $"b").as("kernel"),
      hofDot($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot returns NULL on mismatched lengths and null elements") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),          // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),    // null element left
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](null, 2.0)),    // null element right
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))      // clean
    ).toDF("a", "b")
    val got = df.select(VecExprs.vec_dot($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(None, None, None, Some(11.0)))
  }

  test("vec_dot NULL input array propagates null; codegen off path agrees") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    def eval() = df.select(VecExprs.vec_dot($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    val withCodegen = eval()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = eval()
      assert(withCodegen === interpreted)
      assert(withCodegen === Seq(None, Some(11.0)))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }

  test("vec_argmin_sqdist: nearest cell, lowest-cell ties, null/length guard, codegen==interpreted") {
    val cents = Seq(Seq(0L, 0L), Seq(10L, 0L), Seq(0L, 10L))
    val df = Seq(
      (1L, Some(Seq(1L, 1L))),    // nearest cell 0
      (2L, Some(Seq(9L, 1L))),    // nearest cell 1
      (3L, Some(Seq(5L, 0L))),    // tie cells 0/1 (25 vs 25) -> 0
      (4L, Some(Seq(0L, 10L))),   // exact on cell 2
      (5L, Some(Seq(1L, 2L, 3L))), // wrong dim -> null
      (6L, None: Option[Seq[Long]]) // null vec -> null
    ).toDF("id", "xq")
    def eval() = df.orderBy($"id")
      .select(VecExprs.vec_argmin_sqdist($"xq", cents)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val withCodegen = eval()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(eval() === withCodegen)
      assert(withCodegen === Seq(Some(0L), Some(1L), Some(0L), Some(2L), None, None))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }

  test("cosine of a vector with itself is 1.0") {
    val df = Seq(Tuple1(Array(0.3f, -0.7f, 0.64f))).toDF("v")
    val sim = df.select(Vectors.cosine($"v", $"v")).head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }
}
