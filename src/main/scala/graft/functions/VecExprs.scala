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

object VecExprs {
  import org.apache.spark.sql.GraftShim.{column, expression}

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
