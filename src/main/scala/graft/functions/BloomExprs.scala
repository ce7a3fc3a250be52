package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe.
  *
  * The 100 TB shape this enables: a semi join whose build side is
  * small-ish but whose probe side is the full fact table normally
  * shuffles the fact on the join key. Shipping a ~MB bloom filter of
  * the build-side keys to every task instead lets the fact scan drop
  * non-matching rows BEFORE any exchange — the same trick Spark's own
  * runtime row-level filtering applies inside joins
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed here
  * as a first-class, explicitly plannable operator (the engine user
  * controls when the build side is worth sketching, e.g. reusing one
  * sketch across many queries).
  *
  * The filter bytes travel in the expression (serialized sketch from
  * `BloomFilter.writeTo`); each executor lazily deserializes once.
  * `doGenCode` emits a direct virtual call on the expression instance
  * via `addReferenceObj` — no boxing, stays inside whole-stage
  * codegen.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from generated code. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BloomMightContainLong needs a bigint child, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(nc: Expression): BloomMightContainLong =
    copy(child = nc)

  // case-class equality on Array[Byte] is reference identity, which
  // would defeat semanticEquals / subexpression elimination for
  // probes built from the same sketch — compare contents instead
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContainLong =>
      child == o.child && java.util.Arrays.equals(bloomBytes, o.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomExprs {
  import org.apache.spark.sql.GraftShim.{column, expression}

  /** Membership probe of a bigint column against serialized
    * `org.apache.spark.util.sketch.BloomFilter` bytes.
    */
  def might_contain_long(key: Column, bloomBytes: Array[Byte]): Column =
    column(BloomMightContainLong(expression(key), bloomBytes))
}
