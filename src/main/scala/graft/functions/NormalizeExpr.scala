package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression — the missing
  * preprocessing step in front of every exact/fingerprint dedup: "café"
  * composed (U+00E9) and decomposed (e + U+0301) are byte-different, so
  * without normalization they hash apart, survive exact dedup, and count
  * as distinct n-grams. Spark has no built-in for this (lower/trim only);
  * a Scala UDF would pay serialization + boxing per row.
  *
  * Forms: NFC (canonical compose — the storage/dedup default), NFD, NFKC
  * (compatibility: ligatures/width-forms fold — the aggressive matching
  * form), NFKD.
  *
  * Scale fast path: a pure-ASCII value (the overwhelming majority of a
  * web corpus) is already normalized under every form — detected with one
  * byte scan on the UTF8String, returning the INPUT object with no String
  * decode, no Normalizer call, no allocation. Non-ASCII rows take the
  * java.text.Normalizer path (Unicode-conformant, same algorithm
  * utf8proc/ICU implement). Codegen: whole-stage-friendly via a bound
  * reference call, like [[SimHash64]].
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form.toUpperCase)

  // analysis-time type error, not a per-row ClassCastException at
  // execution (the BloomExprs/FingerprintExprs convention)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, normForm)) s
    else UTF8String.fromString(Normalizer.normalize(str, normForm))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("normExpr", this, classOf[NormalizeText].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpr {
  /** `unicode_normalize(c, form)` — form ∈ NFC | NFD | NFKC | NFKD. */
  def normalize(c: Column, form: String = "NFC"): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(c), form))
}
