package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built Bloom filter, as a codegen
  * expression — the prefilter of [[graft.operators.BloomJoin]]. The
  * deserialized filter rides to the executors via
  * `ctx.addReferenceObj` (one object per generated class, not per
  * row) and the probe stays inside WholeStageCodegen — no UDF boxing;
  * the same mechanism as Spark's own runtime-filter injection
  * (`BloomFilterMightContain`), but available to operator code on a
  * measured, caller-built filter rather than only to the optimizer
  * rule.
  *
  * Contract: NEVER a false negative — a row whose key IS in the built
  * set always passes (the Bloom guarantee join correctness rests on);
  * false positives pass too and are removed by the exact verify join
  * downstream. NULL keys null-propagate; call sites coalesce to false
  * (a null key never matches an equi-join anyway).
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName supports BIGINT and STRING keys; got $t")
    }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: Long => filter.mightContainLong(l)
    case s: org.apache.spark.unsafe.types.UTF8String =>
      filter.mightContainBinary(s.getBytes)
    case _ => false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType => s"${ev.value} = $bloomRef.mightContainLong($v);"
      case StringType =>
        s"${ev.value} = $bloomRef.mightContainBinary($v.getBytes());"
      case _ => s"${ev.value} = false;"
    })
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
