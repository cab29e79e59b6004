package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built Bloom filter, as a native
  * codegen'd predicate. The filter rides to executors ONCE as a reference
  * object (like LshSignatures' planes) instead of per-row; the generated
  * code is a single virtual call, so the probe stays inside whole-stage
  * codegen — no UDF, no boxing.
  *
  * Exists because Spark's `DataFrameStatFunctions.bloomFilter` builds the
  * sketch but offers no expression to APPLY it in a plan (the built-in
  * BloomFilterMightContain is reserved for the runtime-filtering rule's
  * internal use). Supports string and long keys — the same types
  * `stat.bloomFilter` accepts ingest for.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string or bigint, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => filter.mightContainString(input.asInstanceOf[UTF8String].toString)
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      val call = child.dataType match {
        case StringType => s"$ref.mightContainString($v.toString())"
        case LongType => s"$ref.mightContainLong($v)"
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExprs {
  import org.apache.spark.sql.GraftBridge

  def mightContain(c: Column, filter: BloomFilter): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c), filter))
}
