package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Codegen'd media-signature kernel.
  *
  * The multimodal signature pass ([[graft.multimodal.Media
  * .extractSignatures]]) originally ran as a `Dataset.mapPartitions`,
  * which breaks WholeStageCodegen and pays an encoder round-trip on
  * every binary payload. The md5 half is a codegen'd Spark built-in
  * already; this expression is the embedding half — the deterministic
  * 16-dim byte-fold stub (dim d accumulates `(byte & 0xff) − 64` over
  * positions ≡ d mod 16; a real deployment swaps the kernel for a
  * CLIP/audio encoder UDF at this exact seam). Same discipline as
  * [[VecDot]]: interpreted `nullSafeEval` and generated code compute
  * the identical arithmetic in the identical order, so results are
  * bit-equal and the spec pins the parity.
  */
case class EmbedStub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"EmbedStub needs binary, got ${t.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val v = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      v(i % 16) += (bytes(i) & 0xff) - 64
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      s"""
         |double[] $v = new double[16];
         |for (int $i = 0; $i < $x.length; $i++) {
         |  $v[$i % 16] += (double) (($x[$i] & 0xff) - 64);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EmbedStub =
    copy(child = newChild)
}

object MediaExprs {
  import org.apache.spark.sql.GraftShim.{column, expression}

  /** Deterministic 16-dim stub embedding of a binary payload. */
  def embed_stub(bytes: Column): Column = column(EmbedStub(expression(bytes)))
}
