package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense-vector kernels.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * evaluated interpretively — fine for small data, but a 64-dim dot
  * product over millions of candidate pairs becomes the bottleneck
  * (observed ~10× slowdown in the all-pairs similarity bench). This
  * is exactly the case the custom-Expression escape hatch exists for:
  * a tight primitive loop with `doGenCode`, no boxing, no per-element
  * lambda dispatch.
  *
  * `VecDot` accepts `array<float>` or `array<double>` children (both
  * sides must match) and accumulates in double, index order — the
  * same left-to-right semantics as the interpreted formulation, so
  * results are bit-identical to `Vectors.dot` on cast-to-double
  * input.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"VecDot needs two array<float> or two array<double>, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  // Null semantics match the interpreted zip_with+aggregate twin:
  // a null element anywhere, or mismatched lengths (zip_with pads
  // with null), yields a NULL result rather than a silent truncation.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (elemIsFloat) acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      else acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (getter, cast) = if (elemIsFloat) ("getFloat", "(double)") else ("getDouble", "")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $cast$x.$getter($i) * $cast$y.$getter($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Argmin cell over a literal centroid matrix for a quantized
  * (array<long>) vector: returns the index of the centroid with the
  * smallest squared L2 distance, ties to the LOWEST index.
  *
  * Exists for plan-size reasons as much as runtime ones: spelling
  * k×dim squared differences as column arithmetic builds a ~20k-node
  * expression tree whose ANALYSIS alone costs seconds per query (the
  * k-means gate entry measured ~4 s of pure driver time at k=10,
  * dim=64); as a single node carrying the matrix in one reference
  * object, analysis is O(1) and the distance loop is a tight
  * primitive nest in both interpreted and generated form. Integer
  * math throughout — this is the engine-side twin of the exact
  * quantized k-means contract (see [[graft.ops.KMeans]]).
  */
case class VecArgminSqDist(child: Expression, centroids: Seq[Seq[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty && centroids.forall(_.size == centroids.head.size),
    "centroid matrix must be non-empty and rectangular")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"VecArgminSqDist needs array<bigint>, got ${t.simpleString}")
    }

  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = matrix(0).length
    if (x.numElements() != dim) return null
    // one null scan up front, not k per row — the distance nest stays
    // branch-free for the JIT
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    var best = Long.MaxValue
    var bestCell = 0L
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      var acc = 0L
      i = 0
      while (i < dim) {
        val d = x.getLong(i) - cv(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bestCell = c.toLong }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "long[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val dim = ctx.freshName("dim")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $dim = $m[0].length;
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    long $best = Long.MAX_VALUE;
         |    long $bestCell = 0L;
         |    for (int $c = 0; $c < $m.length; $c++) {
         |      long $acc = 0L;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        long $d = $x.getLong($i) - $m[$c][$i];
         |        $acc += $d * $d;
         |      }
         |      if ($acc < $best) { $best = $acc; $bestCell = (long) $c; }
         |    }
         |    ${ev.value} = $bestCell;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecArgminSqDist =
    copy(child = newChild)
}

object VecExprs {
  import org.apache.spark.sql.GraftShim.{column, expression}

  /** Argmin centroid index by squared L2 over a quantized vector. */
  def vec_argmin_sqdist(v: Column, centroids: Seq[Seq[Long]]): Column =
    column(VecArgminSqDist(expression(v), centroids))

  /** Dot product of two equally-typed float/double array columns. */
  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))

  /** Squared L2 norm. */
  def vec_norm2(v: Column): Column = vec_dot(v, v)

  /** Cosine similarity, computed as dot/(sqrt(n2a)*sqrt(n2b)). */
  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_norm2(a)) * sqrt(vec_norm2(b)))
  }
}
