package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.VecDot

/** Catalyst optimizer rule: rewrite the interpreted higher-order
  * dot-product pattern
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  * into the codegen'd [[graft.functions.VecDot]] kernel.
  *
  * Why a RULE and not just the `vec_dot` helper: `ArrayAggregate` is
  * `CodegenFallback` — any query spelling the dot product with
  * public HOFs (including plain SQL users who never import this
  * library's helpers) drops out of whole-stage codegen and boxes two
  * lambda calls per element. The rewrite is semantics-preserving:
  * identical left-to-right double accumulation, and identical null
  * behavior (`zip_with` length-padding → null element → null sum ≡
  * VecDot's null-on-mismatch; see VecExprsSpec). It fires only when
  * both sides are `array<float>` or both `array<double>` — the
  * mixed-type HOF falls through untouched.
  */
object VecKernelRewrite extends Rule[LogicalPlan] {

  /** The lambda variable `v`, possibly under WIDENING casts to double
    * (the canonical twin writes `x.cast("double")`; for double input
    * the cast is already simplified away by the time the optimizer
    * fixpoints). Only double-target casts unwrap: a narrowing cast in
    * the chain (e.g. a deliberate round-to-float) changes semantics
    * and must block the rewrite.
    */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => isVar(c.child, v)
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  private def bothVars(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))

  private def eligible(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => true
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul @ Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(f: NamedLambdaVariable), _))
        if eligible(a, b) && mul.dataType == DoubleType &&
          bothVars(mx, my, x, y) && bothVars(al, ar, acc, v) &&
          fin.exprId == f.exprId =>
        // mul.dataType == DoubleType matters for float arrays: a
        // lambda multiplying raw floats rounds each product to float
        // — VecDot (widen-then-multiply) would change results, so
        // only the cast-to-double spelling rewrites
        VecDot(a, b)
    }
}

/** `SparkSessionExtensions` entry point: register via
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injects:
  *  - [[VecKernelRewrite]] into the operator-optimization batch;
  *  - `vec_dot(array, array)` as a SQL-callable function, so pure-SQL
  *    clients reach the codegen'd kernel directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VecKernelRewrite)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vec_dot takes exactly 2 arguments, got ${children.length}")
        VecDot(children.head, children(1))
      }))
  }
}
